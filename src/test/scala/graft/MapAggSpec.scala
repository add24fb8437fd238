package graft

import org.apache.spark.sql.functions._
import graft.operators.{IncrementalRollup, MapAgg}

/** MapAgg (CH sumMap) and IncrementalRollup (SummingMergeTree /
  * materialized-view merge) semantics on hand-built frames. */
class MapAggSpec extends SparkSpec {
  import spark.implicits._

  private def mapDf(rows: Seq[(Long, Map[String, Long])]) =
    rows.toDF("g", "m")

  test("sumMap unions keys and sums values per group") {
    val df = mapDf(Seq(
      (1L, Map("a" -> 1L, "b" -> 2L)),
      (1L, Map("b" -> 3L, "c" -> 4L)),
      (2L, Map("a" -> 10L))))
    val out = MapAgg.sumMapExploded(df, Seq("g"), col("m"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (1L, "a") -> 1L, (1L, "b") -> 5L, (1L, "c") -> 4L, (2L, "a") -> 10L))
  }

  test("sumMap map form is key-sorted and matches the exploded form") {
    val df = mapDf(Seq(
      (1L, Map("z" -> 1L, "a" -> 2L)),
      (1L, Map("m" -> 3L, "z" -> 5L))))
    val m = MapAgg.sumMap(df, Seq("g"), col("m"))
      .select(col("summed_map")).as[Map[String, Long]].head()
    assert(m === Map("a" -> 2L, "m" -> 3L, "z" -> 6L))
    // reassembly is deterministic: keys ascend
    assert(m.keys.toSeq === m.keys.toSeq.sorted)
  }

  test("minMap/maxMap aggregate key-wise extremes") {
    val df = mapDf(Seq(
      (1L, Map("a" -> 5L, "b" -> 2L)),
      (1L, Map("a" -> 3L, "c" -> 9L))))
    val mn = MapAgg.minMapExploded(df, Seq("g"), col("m"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val mx = MapAgg.maxMapExploded(df, Seq("g"), col("m"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(mn === Map("a" -> 3L, "b" -> 2L, "c" -> 9L))
    assert(mx === Map("a" -> 5L, "b" -> 2L, "c" -> 9L))
  }

  test("null and empty maps contribute nothing") {
    val df = Seq(
      (1L, Map("a" -> 1L)),
      (1L, Map.empty[String, Long]))
      .toDF("g", "m")
      .unionByName(Seq(1L).toDF("g")
        .withColumn("m", lit(null).cast("map<string,bigint>")))
    val out = MapAgg.sumMapExploded(df, Seq("g"), col("m"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map("a" -> 1L))
  }

  private def ev(rows: Seq[(String, Double)]) = rows.toDF("k", "v")

  test("incremental rollup: merged states == direct rollup, any split") {
    val all = Seq(("a", 1.5), ("a", 2.25), ("b", 3.0), ("a", 4.0), ("b", 0.5))
    val direct = IncrementalRollup.finalize(
      IncrementalRollup.partialStates(ev(all), Seq("k"), col("v")), Seq("k"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // split 2/2/1 and merge in a scrambled order
    val parts = Seq(
      IncrementalRollup.partialStates(ev(all.slice(3, 5)), Seq("k"), col("v")),
      IncrementalRollup.partialStates(ev(all.slice(0, 2)), Seq("k"), col("v")),
      IncrementalRollup.partialStates(ev(all.slice(2, 3)), Seq("k"), col("v")))
    val merged = IncrementalRollup.finalize(
      IncrementalRollup.merge(Seq("k"), parts), Seq("k"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(merged === direct)
    assert(merged === Map("a" -> ((3L, 7.75)), "b" -> ((2L, 3.5))))
  }

  test("tiered rollup: tier boundaries, truncation, and totals preserved") {
    val day = 86400000000000L
    val asOf = 1767225600000000000L // 2026-01-01 00:00 UTC
    // ages 0, 29 (both daily), 30, 89 (weekly), 90, 120 (monthly)
    val rows = Seq(0L, 29L, 30L, 89L, 90L, 120L).map(a =>
      ("t", asOf - a * day, 1.0)).toDF("k", "ts", "v")
    val out = IncrementalRollup.tieredRollup(
        rows.withColumn("as_of", lit(asOf)),
        Seq("k"), col("ts"), col("v"), col("as_of"),
        Seq(IncrementalRollup.Tier(0, "day"),
          IncrementalRollup.Tier(30, "week"),
          IncrementalRollup.Tier(90, "month")))
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    val grans = out.keys.groupBy(_._1).view.mapValues(_.size).toMap
    assert(grans === Map("day" -> 2, "week" -> 2, "month" -> 2))
    // daily buckets keep the exact date
    assert(out.contains(("day", "2026-01-01")) && out.contains(("day", "2025-12-03")))
    // weekly buckets are Monday-truncated: 2025-12-02 → 2025-12-01 (Mon)
    assert(out.contains(("week", "2025-12-01")))
    // monthly buckets are month-start
    assert(out.keys.filter(_._1 == "month").forall(_._2.endsWith("-01")))
    // no row lost or duplicated by tiering
    assert(out.values.sum === 6L)
  }

  test("tiered rollup: rows newer than the as-of clock stay in the finest tier") {
    val day = 86400000000000L
    val asOf = 1767225600000000000L
    val rows = Seq(-3L, 0L).map(a => ("t", asOf - a * day, 1.0))
      .toDF("k", "ts", "v") // one row 3 days in the FUTURE (negative age)
    val out = IncrementalRollup.tieredRollup(
        rows.withColumn("as_of", lit(asOf)),
        Seq("k"), col("ts"), col("v"), col("as_of"),
        Seq(IncrementalRollup.Tier(0, "day"), IncrementalRollup.Tier(30, "week")))
      .collect().map(r => r.getString(1)).toSeq
    assert(out === Seq("day", "day")) // clock skew never coarsens fresh data
  }

  test("incremental rollup: merge of merges (re-mergeable states)") {
    val a = IncrementalRollup.partialStates(ev(Seq(("a", 1.0))), Seq("k"), col("v"))
    val b = IncrementalRollup.partialStates(ev(Seq(("a", 2.0))), Seq("k"), col("v"))
    val c = IncrementalRollup.partialStates(ev(Seq(("a", 4.0))), Seq("k"), col("v"))
    val ab = IncrementalRollup.merge(Seq("k"), Seq(a, b))
    val abc = IncrementalRollup.merge(Seq("k"), Seq(ab, c))
    val out = IncrementalRollup.finalize(abc, Seq("k"))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    assert(out === ((3L, 7.0)))
  }
}
