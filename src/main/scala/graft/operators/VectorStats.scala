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
  * Scale shape: posexplode inflates rows ×dim, then partial
  * aggregation compresses each map task to |labels|·dim rows before
  * the single shuffle — the classic sum-sketch profile; no collect,
  * no per-key sort. */
object VectorStats {

  /** Per-(label, dimension) micro-unit sums and counts — exact
    * integer building blocks of the per-label centroid (divide
    * downstream; integer division semantics differ across engines, so
    * the operator hands back the exact numerator/denominator). */
  def centroidSums(embeddings: DataFrame, labelCol: String,
                   vecCol: String): DataFrame =
    embeddings
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col(labelCol), col("dim"))
      .agg(
        sum(round(col("x").cast("double") * 1000000).cast("long")).as("sum_micro"),
        count(lit(1)).as("n_vecs"))

  /** Symmetric int8 quantization of an embedding column — 4× storage
    * cut for ANN candidate stages (clip to [-1,1], scale by 127,
    * scale-0 round: deterministic on identical IEEE doubles). Kept as
    * an array<int> column; one projection, no shuffle. */
  def quantizeInt8(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(vec, x =>
      round(greatest(least(x.cast("double"), lit(1.0)), lit(-1.0)) * 127)
        .cast("int"))
}
