package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed vector statistics over an embedding column — the
  * centroid/summary pass feeding IVF training, cluster audits, and
  * embedding-drift checks (SURVEY §2C similarity family).
  *
  * Determinism: per-element values are quantized to integer micro
  * units with scale-0 round() BEFORE the cross-row sum — double
  * summation order across partitions is nondeterministic, but integer
  * sums commute exactly (and scale-0 rounding of identical doubles is
  * tie-exact on both engines: BigDecimal HALF_UP and DuckDB round()
  * both break ties away from zero).
  *
  * Scale shape (r11): the [[graft.plans.VectorSumLong]] aggregate sums
  * the micro-quantized vectors element-wise with O(dim) map-side
  * state, so N rows cross the one exchange and the ×dim explosion
  * happens only AFTER aggregation on |labels| rows — the r10 form
  * posexploded N·dim rows before its partial aggregation. No collect,
  * no per-key sort. */
object VectorStats {

  /** Per-(label, dimension) micro-unit sums and counts — exact
    * integer building blocks of the per-label centroid (divide
    * downstream; integer division semantics differ across engines, so
    * the operator hands back the exact numerator/denominator). */
  def centroidSums(embeddings: DataFrame, labelCol: String,
                   vecCol: String): DataFrame =
    embeddings
      .groupBy(col(labelCol))
      .agg(
        graft.functions.Fns.vecSumLong(transform(col(vecCol),
          x => round(x.cast("double") * 1000000).cast("long"))).as("__s"),
        count(col(vecCol)).as("n_vecs"))
      .select(col(labelCol), posexplode(col("__s")).as(Seq("dim", "sum_micro")),
        col("n_vecs"))
      .select(col(labelCol), col("dim"), col("sum_micro"), col("n_vecs"))

  /** Symmetric int8 quantization of an embedding column — 4× storage
    * cut for ANN candidate stages (clip to [-1,1], scale by 127,
    * scale-0 round: deterministic on identical IEEE doubles). Kept as
    * an array<int> column; one projection, no shuffle. */
  def quantizeInt8(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(vec, x =>
      round(greatest(least(x.cast("double"), lit(1.0)), lit(-1.0)) * 127)
        .cast("int"))
}
