package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse SummingMergeTree / AggregatingMergeTree semantics — the
  * materialized-view pattern the reference's tables are built to feed:
  * each ingest batch appends a "part", and parts holding pre-aggregated
  * states collapse by merging states at read/merge time
  * (clickhouse-batch-client.class.ts:492-568 creates the MergeTree
  * tables; CH merges parts in the background).
  *
  * Spark-first shape: a "state" is exactly a partial aggregate —
  * mergeable (count, decimal-sum) pairs. `partialStates` is one
  * partial-agg pass over a batch; `merge` unions any number of state
  * frames and re-aggregates (sum of counts, sum of sums) — the same
  * algebra Spark's own partial/final aggregation uses, so
  * merge(states(A), states(B)) == states(A ∪ B) exactly, in any
  * merge order (decimal sums are associative and commutative; no
  * float order-dependence). At 100 TB this is incremental view
  * maintenance: each micro-batch contributes states the size of its
  * key space, merges are state-sized — the raw event history is never
  * rescanned.
  */
object IncrementalRollup {

  private def dec(scale: Int) = s"decimal(18,$scale)"

  /** One batch → its rollup states: `(keys…, ps_n, ps_sum)`.
    * A single partial-agg-friendly pass (map-side combine applies). */
  def partialStates(batch: DataFrame, keys: Seq[String], value: Column,
                    scale: Int = 2): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("ps_n"),
        sum(value.cast(dec(scale))).as("ps_sum"))

  /** Merge state frames (any count, any order). Types are kept closed
    * under merge — ps_n stays long, ps_sum stays decimal(18,s) — so
    * merged output is itself a valid input to further merges. */
  def merge(keys: Seq[String], states: Seq[DataFrame], scale: Int = 2): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state frame")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("ps_n")).cast("long").as("ps_n"),
        sum(col("ps_sum")).cast(dec(scale)).as("ps_sum"))
  }

  /** Read-side finalize: states → the aggregate a direct groupBy over
    * the union of all batches would have produced. */
  def finalize(states: DataFrame, keys: Seq[String]): DataFrame =
    states.select(keys.map(col) :+ col("ps_n").as("n_rows") :+
      col("ps_sum").cast("double").as("sum_value"): _*)
}
