package graft.plans

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch family (CH `uniqTheta` + its set algebra). HLL (b34)
  * answers only |A|, |A∪B|; theta sketches additionally estimate
  * |A∖B| and |A∩B| — the audience-difference questions ("clicked but
  * never purchased") that are otherwise an exact shuffle-heavy
  * anti-join. Backed by datasketches-java (already Spark's sketch
  * library). Mergeable (the union buffer), so aggregation is
  * partial/final like any sketch: one ~2^lgK·8-byte buffer per group
  * per partition crosses the exchange. Estimates are rows-only w.r.t.
  * the DuckDB oracle (merge-order-independent for theta unions, but
  * DuckDB has no theta implementation to mirror).
  */
object ThetaSketches {
  private[plans] val LgK = 12

  private[plans] def wrap(bytes: Array[Byte]): CompactSketch =
    CompactSketch.wrap(Memory.wrap(bytes))

  private[plans] def newUnion(): Union =
    SetOperation.builder().setLogNominalEntries(LgK).buildUnion()
}

/** Aggregate a BIGINT or STRING column into a compact theta sketch
  * (BINARY). */
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg expects BIGINT/INT/STRING, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Union = ThetaSketches.newUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buf.update(v.asInstanceOf[Long])
      case IntegerType => buf.update(v.asInstanceOf[Int].toLong)
      case StringType => buf.update(v.asInstanceOf[UTF8String].toString)
      case _ => ()
    }
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult); b1
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketches.newUnion()
    u.union(ThetaSketches.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

private[plans] trait ThetaBinaryCheck { self: BinaryExpression =>
  def checkThetaInputs(name: String): TypeCheckResult =
    (self.left.dataType, self.right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$name expects (BINARY, BINARY) theta sketches, got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
}

/** Rounded distinct-count estimate of a serialized theta sketch. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_estimate"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate expects BINARY, got ${other.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    math.round(ThetaSketches.wrap(v.asInstanceOf[Array[Byte]]).getEstimate)
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** Estimated |A ∖ B| of two serialized theta sketches. */
case class ThetaAnotBEstimate(left: Expression, right: Expression)
  extends BinaryExpression with ThetaBinaryCheck with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_anotb_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    checkThetaInputs(prettyName)
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder()
      .setLogNominalEntries(ThetaSketches.LgK).buildANotB()
    math.round(op.aNotB(
      ThetaSketches.wrap(a.asInstanceOf[Array[Byte]]),
      ThetaSketches.wrap(b.asInstanceOf[Array[Byte]])).getEstimate)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaAnotBEstimate =
    copy(left = l, right = r)
}

/** Estimated |A ∩ B| of two serialized theta sketches. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression with ThetaBinaryCheck with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_intersect_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    checkThetaInputs(prettyName)
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder()
      .setLogNominalEntries(ThetaSketches.LgK).buildIntersection()
    op.intersect(ThetaSketches.wrap(a.asInstanceOf[Array[Byte]]))
    op.intersect(ThetaSketches.wrap(b.asInstanceOf[Array[Byte]]))
    math.round(op.getResult.getEstimate)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersectEstimate =
    copy(left = l, right = r)
}
