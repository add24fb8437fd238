package graft.plans

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, DoubleType}

/** Element-wise EXACT decimal sum of DOUBLE arrays: each element is
  * converted exactly as Spark's `CAST(x AS DECIMAL(28,12))` (the
  * shortest-decimal form of the double, HALF_UP to scale 12) and
  * summed in arbitrary precision, so the result is bit-identical to
  * `sum(CAST(element AS DECIMAL(28,12)))` over the posexplode'd rows —
  * while shipping ONE d-length vector per group per partition instead
  * of N·d exploded rows through the exchange. This is the mergeable
  * kernel behind Lloyd's mean step ([[graft.operators.Similarity]]
  * refineCentroids): at 1 B vectors × 64 dims the explode form
  * shuffles 64 B rows twice; this aggregate shuffles N rows once with
  * O(d) state. Decimal addition is associative and commutative, so the
  * sum is deterministic across partitionings and replays — the
  * property the oracle mirrors (DuckDB `sum(CAST(x AS
  * DECIMAL(28,12)))`) rely on.
  *
  * Rows may have different lengths (the buffer grows, missing tail
  * contributes nothing) — but note the MEAN only equals
  * `sum/count(group)` when vectors are fixed-length, since a ragged
  * corpus has per-position counts. Callers dividing by the group count
  * (the Lloyd step) must feed fixed-dimension vectors.
  */
case class VectorSumDecimal(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[JBigDecimal]] {

  import VectorSumDecimal._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DecimalType(OutPrecision, Scale), containsNull = false)
  override def prettyName: String = "vec_sum_dec"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum_dec expects ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[JBigDecimal] =
    Array.empty[JBigDecimal]

  private def addInto(buf: Array[JBigDecimal],
                      xs: Array[JBigDecimal]): Array[JBigDecimal] = {
    if (xs.length <= buf.length) {
      var i = 0
      while (i < xs.length) { buf(i) = buf(i).add(xs(i)); i += 1 }
      buf
    } else {
      val out = java.util.Arrays.copyOf(xs, xs.length)
      var i = 0
      while (i < buf.length) { out(i) = out(i).add(buf(i)); i += 1 }
      out
    }
  }

  override def update(buf: Array[JBigDecimal], input: InternalRow): Array[JBigDecimal] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData].toDoubleArray()
      val xs = new Array[JBigDecimal](arr.length)
      var i = 0
      while (i < arr.length) { xs(i) = toDec(arr(i)); i += 1 }
      addInto(buf, xs)
    }
  }

  override def merge(b1: Array[JBigDecimal], b2: Array[JBigDecimal]): Array[JBigDecimal] =
    addInto(b1, b2)

  override def eval(buf: Array[JBigDecimal]): Any =
    new GenericArrayData(buf.map(d => Decimal(scala.math.BigDecimal(d),
      OutPrecision, Scale): Any))

  override def serialize(buf: Array[JBigDecimal]): Array[Byte] = {
    val strs = buf.map(_.toPlainString.getBytes("US-ASCII"))
    val bb = java.nio.ByteBuffer.allocate(4 + strs.map(_.length + 4).sum)
    bb.putInt(strs.length)
    strs.foreach { s => bb.putInt(s.length); bb.put(s) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[JBigDecimal] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[JBigDecimal](bb.getInt)
    var i = 0
    while (i < out.length) {
      val s = new Array[Byte](bb.getInt); bb.get(s)
      out(i) = new JBigDecimal(new String(s, "US-ASCII")); i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumDecimal =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumDecimal =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorSumDecimal =
    copy(child = newChildren.head)
}

object VectorSumDecimal {
  /** Matches CAST(x AS DECIMAL(28,12)): input precision/scale. */
  val InPrecision = 28
  /** Matches Spark's sum-over-decimal result type: precision + 10. */
  val OutPrecision = 38
  val Scale = 12

  /** Spark's double→decimal conversion: the SHORTEST decimal form of
    * the double (Double.toString, what scala BigDecimal.decimal uses),
    * then HALF_UP to scale 12 — NOT the exact binary expansion. */
  def toDec(x: Double): JBigDecimal =
    new JBigDecimal(java.lang.Double.toString(x))
      .setScale(Scale, RoundingMode.HALF_UP)
}
