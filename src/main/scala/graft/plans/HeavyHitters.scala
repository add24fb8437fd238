package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy hitters — the algorithm behind ClickHouse's
  * `topK`/`approx_top_k` (Metwally et al., "Efficient Computation of
  * Frequent and Top-k Elements in Data Streams").
  *
  * Why it exists next to the exact b14 top-k: exact top-k needs the
  * full (key, value) aggregate — at 100 TB that's a giant shuffle
  * whose key space is unbounded. SpaceSaving keeps a FIXED `capacity`
  * counters per group, one pass, mergeable — the shuffle carries
  * ≤ capacity (value, count, err) triples per group per map task.
  * Guarantee: any value with true count > N/capacity is present, and
  * reported count overestimates by at most its `err` field.
  *
  * Returns map<string, count_upper_bound> of the tracked values —
  * counts are merge-order-dependent upper bounds (the sketch trade),
  * so queries over it are rows-only w.r.t. the DuckDB oracle; the
  * membership guarantee is what the spec pins.
  */
case class HeavyHitters(
    child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]] {

  require(capacity >= 1, "capacity must be >= 1")

  type Buf = mutable.LinkedHashMap[String, (Long, Long)] // value -> (count, err)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters expects STRING, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Buf = mutable.LinkedHashMap.empty

  private def offer(buf: Buf, v: String, n: Long, err: Long): Unit =
    buf.get(v) match {
      case Some((c, e)) => buf.update(v, (c + n, e + err))
      case None if buf.size < capacity => buf.update(v, (n, err))
      case None =>
        // evict the current min and inherit its count as error bound
        val (minV, (minC, _)) = buf.minBy { case (k, (c, _)) => (c, k) }
        buf.remove(minV)
        buf.update(v, (minC + n, minC + err))
    }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.toString, 1L, 0L)
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    // deterministic offer order (sorted by value) so partial-agg
    // permutations of the SAME buffers merge identically
    b2.toSeq.sortBy(_._1).foreach { case (v, (c, e)) => offer(b1, v, c, e) }
    b1
  }

  override def eval(buf: Buf): Any = {
    val entries = buf.toSeq.sortBy { case (v, (c, _)) => (-c, v) }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(entries.map(_._2._1).toArray[Any]))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val items = buf.toSeq.map { case (v, (c, e)) =>
      (v.getBytes(StandardCharsets.UTF_8), c, e)
    }
    val bb = ByteBuffer.allocate(4 + items.map(i => 4 + i._1.length + 16).sum)
    bb.putInt(items.size)
    items.foreach { case (vb, c, e) =>
      bb.putInt(vb.length); bb.put(vb); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = mutable.LinkedHashMap.empty[String, (Long, Long)]
    (0 until n).foreach { _ =>
      val vb = new Array[Byte](bb.getInt); bb.get(vb)
      out.update(new String(vb, StandardCharsets.UTF_8), (bb.getLong, bb.getLong))
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
}
