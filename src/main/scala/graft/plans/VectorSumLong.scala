package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise sum of BIGINT arrays — the mergeable kernel behind
  * distributed Gram/covariance accumulation (c96 and any moment-matrix
  * build): each row contributes its pair-product vector, partials
  * combine map-side inside ObjectHashAggregate, and only ONE
  * d(d+1)/2-length vector per partition crosses the exchange — vs
  * N·d²/2 rows for the posexplode-then-groupBy equivalent. Exact
  * int64, order-independent, so the DuckDB oracle reproduces it
  * bit-for-bit.
  *
  * Rows may have different lengths (the buffer grows, missing tail =
  * 0), which also makes the empty-group case natural: an empty buffer
  * evaluates to an empty array.
  */
case class VectorSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_sum_long"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum_long expects ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def addInto(buf: Array[Long], xs: Array[Long]): Array[Long] = {
    if (xs.length <= buf.length) {
      var i = 0
      while (i < xs.length) { buf(i) += xs(i); i += 1 }
      buf
    } else {
      val out = java.util.Arrays.copyOf(xs, xs.length)
      var i = 0
      while (i < buf.length) { out(i) += buf(i); i += 1 }
      out
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else addInto(buf, v.asInstanceOf[ArrayData].toLongArray())
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    addInto(b1, b2)

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bb.getInt)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorSumLong =
    copy(child = newChildren.head)
}
