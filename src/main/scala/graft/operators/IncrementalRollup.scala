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

  /** One retention tier: rows at least `minAgeDays` old aggregate at
    * `granularity` ("day" | "week" | "month" — date_trunc units). */
  final case class Tier(minAgeDays: Long, granularity: String)

  /** GraphiteMergeTree-style age-tiered retention rollup: recent rows
    * keep fine granularity, older rows collapse to coarser buckets
    * (the CH retention-rule pattern `age > N → precision P`). One
    * projection assigns each row its tier + truncated bucket, then a
    * single hash aggregate — tiering adds NO extra pass or shuffle
    * over a plain rollup.
    *
    * `asOfNanos` is the clock the ages are measured against — pass
    * `lit(nowNanos)` in production. The caller can derive it from the
    * data (max ts via a 1-row broadcast) for reproducible tests; that
    * adds one ts-column-only scan, which production avoids by passing
    * the clock. Tiers must be given fine-to-coarse; the LAST tier
    * whose `minAgeDays` the row reaches wins. */
  def tieredRollup(events: DataFrame, keys: Seq[String], tsNanos: Column,
                   value: Column, asOfNanos: Column, tiers: Seq[Tier],
                   scale: Int = 2): DataFrame = {
    require(tiers.nonEmpty && tiers.head.minAgeDays == 0,
      "first tier must start at age 0")
    require(tiers.map(_.minAgeDays) == tiers.map(_.minAgeDays).sorted,
      "tiers must be ordered fine-to-coarse by minAgeDays")
    val t = graft.functions.Fns.nanosToTimestamp(tsNanos)
    // exact integer floor-division (see Fns.floorDivLong): double
    // division rounds boundary rows into the wrong tier past 2^53
    // nanos (~104 days), and plain decimal division HALF_UP-rounds at
    // reduced scale for day-sized divisors — rows within ~5 µs of a
    // tier edge crossed it
    val age = graft.functions.Fns.floorDivLong(
      asOfNanos - tsNanos, 86400000000000L)
    val gran = tiers.tail.foldLeft(lit(tiers.head.granularity): Column) {
      case (acc, Tier(minAge, g)) => when(age >= minAge, g).otherwise(acc)
    }
    val bucket = tiers.tail.foldLeft(
        date_trunc(tiers.head.granularity.toUpperCase, t): Column) {
      case (acc, Tier(minAge, g)) =>
        when(age >= minAge, date_trunc(g.toUpperCase, t)).otherwise(acc)
    }
    events
      .withColumn("gran", gran)
      .withColumn("bucket_date", date_format(bucket, "yyyy-MM-dd"))
      .groupBy((keys.map(col) :+ col("gran") :+ col("bucket_date")): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(value.cast(dec(scale))).cast("double").as("sum_value"))
  }
}
