package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** ClickHouse `quantileState` / `quantileMerge` — mergeable quantile
  * sketch states (AggregatingMergeTree's second-most-used aggregate
  * after uniqState), the b34-HLL pattern for order statistics.
  *
  * The state is Spark's own Greenwald-Khanna summary
  * ([[org.apache.spark.sql.catalyst.util.QuantileSummaries]], the
  * structure behind `percentile_approx`), serialized with Spark's
  * `PercentileDigestSerializer` — so a part's state is ~O(1/ε·log εn)
  * tuples regardless of part size, merge is associative, and reads
  * never rescan history. Estimates carry GK's rank guarantee
  * (|rank(q̂) − p·n| ≤ ε·n) but depend on insert/merge order, so
  * queries over them are rows-only w.r.t. the DuckDB oracle; the
  * guarantee itself is what QuantileMergeSpec pins.
  */
case class QuantileState(
    child: Expression, accuracy: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ApproximatePercentile.PercentileDigest] {

  require(accuracy >= 1, "accuracy must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "quantile_state"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantile_state expects DOUBLE (cast first), got ${other.catalogString}")
  }

  override def createAggregationBuffer(): ApproximatePercentile.PercentileDigest =
    new ApproximatePercentile.PercentileDigest(1.0d / accuracy)

  override def update(buf: ApproximatePercentile.PercentileDigest,
                      input: InternalRow): ApproximatePercentile.PercentileDigest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: ApproximatePercentile.PercentileDigest,
                     b2: ApproximatePercentile.PercentileDigest): ApproximatePercentile.PercentileDigest = {
    b1.merge(b2); b1
  }

  override def eval(buf: ApproximatePercentile.PercentileDigest): Any =
    ApproximatePercentile.serializer.serialize(buf)

  override def serialize(buf: ApproximatePercentile.PercentileDigest): Array[Byte] =
    ApproximatePercentile.serializer.serialize(buf)
  override def deserialize(bytes: Array[Byte]): ApproximatePercentile.PercentileDigest =
    ApproximatePercentile.serializer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileState =
    copy(child = newChildren.head)
}

/** The read side: union serialized GK states and query percentiles.
  * Returns array<double> aligned with `percentages` (callers project
  * to scalar columns — container cells never reach a result frame);
  * null when every merged state was empty. */
case class QuantileMerge(
    child: Expression, percentages: Seq[Double], accuracy: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ApproximatePercentile.PercentileDigest] {

  require(percentages.nonEmpty && percentages.forall(p => p >= 0 && p <= 1),
    "percentages must be in [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quantile_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantile_merge expects BINARY quantile_state, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): ApproximatePercentile.PercentileDigest =
    new ApproximatePercentile.PercentileDigest(1.0d / accuracy)

  override def update(buf: ApproximatePercentile.PercentileDigest,
                      input: InternalRow): ApproximatePercentile.PercentileDigest = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(ApproximatePercentile.serializer.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(b1: ApproximatePercentile.PercentileDigest,
                     b2: ApproximatePercentile.PercentileDigest): ApproximatePercentile.PercentileDigest = {
    b1.merge(b2); b1
  }

  override def eval(buf: ApproximatePercentile.PercentileDigest): Any = {
    if (buf.quantileSummaries.count == 0L) null
    else new GenericArrayData(buf.getPercentiles(percentages.toArray).toArray[Any])
  }

  override def serialize(buf: ApproximatePercentile.PercentileDigest): Array[Byte] =
    ApproximatePercentile.serializer.serialize(buf)
  override def deserialize(bytes: Array[Byte]): ApproximatePercentile.PercentileDigest =
    ApproximatePercentile.serializer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileMerge =
    copy(child = newChildren.head)
}
