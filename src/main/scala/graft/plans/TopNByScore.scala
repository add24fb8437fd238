package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-n of (score, key) pairs per group, ordered (score desc,
  * key asc) — the multi-probe assignment kernel: where a plain
  * max-of-struct keeps ONE nearest centroid with map-side combine,
  * this keeps the n nearest with the same property. State is n pairs
  * (n ≤ 8 by contract), so the shuffle carries O(n) per group per
  * partition — never the K-candidate expansion. Mirrors as `rn <= n`
  * over a rank window in the DuckDB oracle; ties break exactly like
  * the (score desc, key asc) window order.
  *
  * Output: array<struct<score double, key bigint>> sorted best-first.
  */
case class TopNByScore(
    score: Expression, key: Expression, n: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[List[(Double, Long)]] {

  require(n >= 1 && n <= 8, "n must be in [1, 8] — bounded state is the point")

  override def children: Seq[Expression] = Seq(score, key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("key", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_n_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, key.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, k) => TypeCheckResult.TypeCheckFailure(
        s"top_n_by_score expects (DOUBLE, BIGINT), got (${s.catalogString}, ${k.catalogString})")
    }

  // sorted best-first: score desc, then key asc
  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (s, k) => (-s, k) }

  override def createAggregationBuffer(): List[(Double, Long)] = Nil

  override def update(buf: List[(Double, Long)], input: InternalRow): List[(Double, Long)] = {
    val s = score.eval(input)
    val k = key.eval(input)
    if (s == null || k == null) buf
    else ((s.asInstanceOf[Double], k.asInstanceOf[Long]) :: buf)
      .sorted(ord).take(n)
  }

  override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
    (b1 ++ b2).sorted(ord).take(n)

  override def eval(buf: List[(Double, Long)]): Any =
    new GenericArrayData(buf.map { case (s, k) =>
      new GenericInternalRow(Array[Any](s, k)): Any
    }.toArray)

  override def serialize(buf: List[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (s, k) => bb.putDouble(s); bb.putLong(k) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): List[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    List.fill(bb.getInt)((bb.getDouble, bb.getLong))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopNByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopNByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopNByScore =
    copy(score = newChildren(0), key = newChildren(1))
}
