package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Row-major upper-triangle self-products of a BIGINT array (diagonal
  * included): out[k] = q(i)·q(j) for i ≤ j — the per-row input of the
  * c96 moment-matrix build. The composed form
  * (`flatten(transform(q, (x,i) -> transform(slice(q, i+1, …), …)))`)
  * runs through interpreted higher-order functions — per element a
  * lambda frame, a boxed long, and a fresh nested array; at d = 64
  * that is 2080 boxed products and 65 allocations per row. This
  * expression is the same arithmetic as one tight codegen'd loop into
  * a primitive long[], exactly like the VectorOps family for cosine.
  *
  * Flat index for 1-based (i, j), i ≤ j, width d:
  * (i−1)·d − (i−1)(i−2)/2 + (j−i) + 1 — the mapping c96's pair
  * expansion inverts (pinned by VectorSumSpec).
  */
case class UpperTriangleProducts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "upper_triangle_products"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    UpperTriangleProducts.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.UpperTriangleProducts.compute($c);")

  override protected def withNewChildInternal(c: Expression): UpperTriangleProducts =
    copy(child = c)
}

object UpperTriangleProducts {
  def compute(in: ArrayData): ArrayData = {
    val q = in.toLongArray()
    val n = q.length
    val out = new Array[Long](n * (n + 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i
      while (j < n) { out(k) = q(i) * q(j); k += 1; j += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}
