package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Argmax with a payload: the single best (score, key) per group, tie
  * broken to the SMALLEST key, carrying one array<double> payload —
  * the IVF assignment kernel (payload = the vector, key = the
  * centroid id).
  *
  * Why not `max(struct(score, -key, key, payload))`: a struct with an
  * ArrayType field has no mutable fixed-width aggregation buffer, so
  * Catalyst plans that form as a SortAggregate — and a SORT-aggregate
  * SORTS its input, which here is the N·K centroid cross-join with
  * the dim-wide vector duplicated onto every candidate row. The r12
  * 200k-vector probe measured that map-side sort spilling (~46 GB of
  * struct rows at N=200k, K=448, dim=64) and going superlinear —
  * the hidden N·K·dim term behind an "only N rows cross the
  * exchange" plan. As a TypedImperativeAggregate this hash-aggregates
  * (ObjectHashAggregate): O(1) state per group, the payload copied
  * only when a new maximum WINS (amortized O(N·dim) total), nothing
  * candidate-sized ever sorted or materialized.
  *
  * Tie rule matches the struct form and the oracle's
  * `row_number() OVER (ORDER BY score DESC, key ASC)`: results are
  * bit-identical by construction. */
case class ArgMaxByScore(
    score: Expression, key: Expression, payload: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgMaxByScore.State] {

  override def children: Seq[Expression] = Seq(score, key, payload)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("key", LongType, nullable = false),
    StructField("payload", ArrayType(DoubleType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "arg_max_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, key.dataType, payload.dataType) match {
      case (DoubleType, LongType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, k, p) => TypeCheckResult.TypeCheckFailure(
        "arg_max_by_score expects (DOUBLE, BIGINT, ARRAY<DOUBLE>), got " +
          s"(${s.catalogString}, ${k.catalogString}, ${p.catalogString})")
    }

  override def createAggregationBuffer(): ArgMaxByScore.State = null

  // new candidate wins on (score desc, key asc) — identical to the
  // retired max(struct(score, -key, ...)) lexicographic order
  private def wins(s: Double, k: Long, b: ArgMaxByScore.State): Boolean =
    b == null || s > b.score || (s == b.score && k < b.key)

  override def update(buf: ArgMaxByScore.State, input: InternalRow): ArgMaxByScore.State = {
    val s = score.eval(input)
    val k = key.eval(input)
    if (s == null || k == null) buf
    else {
      val sd = s.asInstanceOf[Double]
      val kl = k.asInstanceOf[Long]
      if (!wins(sd, kl, buf)) buf
      else {
        val p = payload.eval(input)
        if (p == null) buf
        // copy: the input row's array buffer is reused by the scanner
        else ArgMaxByScore.State(sd, kl, p.asInstanceOf[ArrayData].toDoubleArray())
      }
    }
  }

  override def merge(b1: ArgMaxByScore.State, b2: ArgMaxByScore.State): ArgMaxByScore.State =
    if (b2 == null) b1
    else if (wins(b2.score, b2.key, b1)) b2
    else b1

  override def eval(buf: ArgMaxByScore.State): Any =
    if (buf == null) null
    else new GenericInternalRow(Array[Any](
      buf.score, buf.key, new GenericArrayData(buf.payload)))

  override def serialize(buf: ArgMaxByScore.State): Array[Byte] =
    if (buf == null) Array.empty
    else {
      val bb = ByteBuffer.allocate(8 + 8 + 4 + 8 * buf.payload.length)
      bb.putDouble(buf.score); bb.putLong(buf.key)
      bb.putInt(buf.payload.length)
      buf.payload.foreach(bb.putDouble)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): ArgMaxByScore.State =
    if (bytes.isEmpty) null
    else {
      val bb = ByteBuffer.wrap(bytes)
      val s = bb.getDouble; val k = bb.getLong
      ArgMaxByScore.State(s, k, Array.fill(bb.getInt)(bb.getDouble))
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMaxByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMaxByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), key = newChildren(1), payload = newChildren(2))
}

object ArgMaxByScore {
  /** Mutable-free best-so-far: score, its key, and the payload array
    * (owned — always a copy of the scanner's buffer). */
  final case class State(score: Double, key: Long, payload: Array[Double])
}
