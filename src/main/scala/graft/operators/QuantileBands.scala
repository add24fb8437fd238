package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact discrete-quantile rank bands — the audit half of the sketch
  * quantile queries (b15b / b37). For each group and q ∈ {50,90,99}
  * it emits the exact discrete quantile (the value at sorted rank
  * ⌊(n−1)·q/100⌋ + 1 — b15's semantics, DuckDB-mirrorable) plus the
  * dataset values at ranks target ± k, k = max(3, ⌈3·n/accuracy⌉):
  * any estimate honoring the GK ε rank guarantee (with merge slack)
  * must land inside [band_lo, band_hi]. One sort-window per group,
  * shared by all three quantiles — this is the AUDIT path; the
  * production sketch path never sorts.
  *
  * Input columns: (event_type, value, event_id); event_id breaks
  * rank ties deterministically. */
object QuantileBands {

  def bands(ev: DataFrame, accuracy: Int): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    ev.withColumn("rn", row_number().over(w))
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .withColumn("q_pct", explode(array(lit(50L), lit(90L), lit(99L))))
      .withColumn("t", expr("((cnt - 1) * q_pct) div 100") + 1)
      .withColumn("k",
        greatest(lit(3L), ceil(lit(3.0) * col("cnt") / lit(accuracy))))
      .filter(col("rn").between(col("t") - col("k"), col("t") + col("k")))
      .groupBy(col("event_type"), col("q_pct"))
      .agg(min(col("value")).as("band_lo"),
        max(col("value")).as("band_hi"),
        max(when(col("rn") === col("t"), col("value"))).as("q_exact"))
  }
}
