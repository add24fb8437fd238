package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector math over `array<double>` columns.
  *
  * The composed forms (`aggregate(zip_with(a, b, *), 0.0, +)` for the
  * dot product; three such folds for cosine) run through interpreted
  * higher-order functions — per element a lambda frame and a boxed
  * double. One ANN scoring pass over a corpus evaluates them per
  * candidate pair, which made the interpreted overhead the dominant
  * cost of C5-C7. These expressions do the same arithmetic in the same
  * left-to-right order (bit-identical doubles — the DuckDB oracle and
  * the LSH sign decisions depend on that) in one tight loop.
  */
trait VectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
}

/** Σ a(i)·b(i), sequential accumulation from 0.0 (fold order). */
case class DotProductD(left: Expression, right: Expression) extends VectorBinary {
  override def prettyName: String = "dot_product_d"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOpsUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.VectorOpsUtil.dot($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductD =
    copy(left = l, right = r)
}

/** dot/(‖a‖·‖b‖), 0.0 when either norm is zero — one pass for all
  * three reductions. */
case class CosineSimD(left: Expression, right: Expression) extends VectorBinary {
  override def prettyName: String = "cosine_sim_d"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOpsUtil.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.VectorOpsUtil.cosine($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimD =
    copy(left = l, right = r)
}

object VectorOpsUtil {
  /** Matches aggregate(zip_with(a,b,*),0.0,+): zip_with pads the
    * shorter array with null, which nulls the whole fold — arrays are
    * same-length by contract, so we just loop the shared prefix. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else dot / den
  }
}
