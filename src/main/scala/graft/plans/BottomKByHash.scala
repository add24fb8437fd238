package graft.plans

import java.nio.ByteBuffer
import scala.collection.immutable.SortedSet

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Deterministic bounded sample: the k values with the smallest
  * md5(value) per group — a KMV ("k minimum values") bottom-k sketch.
  *
  * Properties that matter in a training-data pipeline:
  *  - deterministic (hash order, no RNG): replays and the DuckDB
  *    oracle reproduce it exactly, unlike reservoir sampling;
  *  - uniform-ish (md5 scrambles the id space), so it IS a random
  *    sample for practical purposes;
  *  - mergeable: union-then-trim, so partial aggregation works and the
  *    shuffle carries at most k values per group per partition;
  *  - doubles as a distinct-count estimator (the classic KMV sketch).
  *
  * v1 takes LongType input (ids); hash is md5 of the decimal string
  * form, which DuckDB mirrors as md5(CAST(x AS VARCHAR)).
  */
case class BottomKByHash(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SortedSet[(String, Long)]] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k_by_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bottom_k_by_hash expects BIGINT, got ${other.catalogString}")
  }

  private def md5hex(s: String): String =
    Md5.hex(Md5.get().digest(s.getBytes("UTF-8")))

  override def createAggregationBuffer(): SortedSet[(String, Long)] = SortedSet.empty

  override def update(buf: SortedSet[(String, Long)], input: InternalRow): SortedSet[(String, Long)] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val value = v.asInstanceOf[Long]
      val trimmed = buf + ((md5hex(value.toString), value))
      if (trimmed.size > k) trimmed - trimmed.last else trimmed
    }
  }

  override def merge(b1: SortedSet[(String, Long)], b2: SortedSet[(String, Long)]): SortedSet[(String, Long)] = {
    var out = b1 ++ b2
    while (out.size > k) out = out - out.last
    out
  }

  override def eval(buf: SortedSet[(String, Long)]): Any =
    new GenericArrayData(buf.toSeq.map(_._2).toArray[Any])

  override def serialize(buf: SortedSet[(String, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * (32 + 8))
    bb.putInt(buf.size)
    buf.foreach { case (h, v) =>
      bb.put(h.getBytes("US-ASCII")); bb.putLong(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SortedSet[(String, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var out = SortedSet.empty[(String, Long)]
    (0 until n).foreach { _ =>
      val hb = new Array[Byte](32); bb.get(hb)
      out = out + ((new String(hb, "US-ASCII"), bb.getLong))
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKByHash =
    copy(child = newChildren.head)
}
