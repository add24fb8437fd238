package graft

import org.apache.spark.sql.functions._
import graft.operators.{Series, TextAnalysis, Ttl}

/** Unit coverage for the round-5 series/TTL/gate operators on
  * hand-built edge cases the synthetic tables don't pin down:
  * counter resets, gap carry vs pre-first-observation nulls, exact
  * day-boundary expiry, and each Gopher gate rule bit in isolation. */
class SeriesTtlSpec extends SparkSpec {
  import spark.implicits._

  test("deltaSum counts only positive deltas; resets contribute nothing") {
    // series a: 10 -> 12 -> 5 (reset) -> 9   => +2 +4 = 6
    // series b: 3 -> 3 -> 4                  => +1 (flat step adds 0)
    // series c: single point                 => 0
    val ev = Seq(
      ("a", 1L, 1L, 10.0), ("a", 2L, 2L, 12.0),
      ("a", 3L, 3L, 5.0), ("a", 4L, 4L, 9.0),
      ("b", 1L, 5L, 3.0), ("b", 2L, 6L, 3.0), ("b", 3L, 7L, 4.0),
      ("c", 9L, 8L, 7.0)).toDF("k", "t", "id", "v")
    val out = Series.deltaSum(ev, "k", "t", "id", col("v"))
      .select(col("k"), col("n_points"), col("delta_sum").cast("double"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out === Map("a" -> ((4L, 6.0)), "b" -> ((3L, 1.0)),
      "c" -> ((1L, 0.0))))
  }

  test("deltaSum orders by time with tie-break, not input order") {
    // rows arrive shuffled; (t, id) order is 1,2,3 -> values 1, 5, 2
    val ev = Seq(
      ("a", 2L, 2L, 5.0), ("a", 1L, 1L, 1.0), ("a", 2L, 3L, 2.0))
      .toDF("k", "t", "id", "v")
    val out = Series.deltaSum(ev, "k", "t", "id", col("v"))
      .select(col("delta_sum").cast("double")).as[Double].head()
    assert(out === 4.0) // +4 (1->5), then 5->2 ignored
  }

  test("ffill carries last observation across gaps, null before first") {
    val sparse = Seq(
      ("a", "2024-01-02", 10.0), ("a", "2024-01-04", 20.0),
      ("b", "2024-01-01", 5.0))
      .toDF("k", "ds", "v").select(col("k"), to_date(col("ds")).as("d"), col("v"))
    val spine = Seq(("2024-01-01", "2024-01-05")).toDF("s0", "s1")
      .select(to_date(col("s0")).as("d0"), to_date(col("s1")).as("d1"))
    val out = Series.ffillDaily(sparse, "k", "d", Seq("v"), spine)
      .select(col("k"), date_format(col("d"), "yyyy-MM-dd"), col("v_ffill"))
      .as[(String, String, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out.size === 10) // 2 keys x 5 days
    assert(out(("a", "2024-01-01")) === None)     // before first obs
    assert(out(("a", "2024-01-02")) === Some(10.0))
    assert(out(("a", "2024-01-03")) === Some(10.0)) // gap carried
    assert(out(("a", "2024-01-04")) === Some(20.0))
    assert(out(("a", "2024-01-05")) === Some(20.0))
    assert(out(("b", "2024-01-05")) === Some(5.0))  // long carry
  }

  test("ttl drops rows at the row boundary and resets cells at the column boundary") {
    val day = 86400000000000L
    val asOf = 100L * day
    // ages: 0, 6.999.., 7 (exact boundary), 20.999.., 21 (exact boundary)
    val ev = Seq(
      (1L, asOf, 1.0), (2L, asOf - 7L * day + 1L, 2.0),
      (3L, asOf - 7L * day, 3.0), (4L, asOf - 21L * day + 1L, 4.0),
      (5L, asOf - 21L * day, 5.0))
      .toDF("event_id", "ts", "value")
    val out = Ttl.expire(ev.withColumn("as_of", lit(asOf)),
        col("ts"), col("as_of"), rowTtlDays = 21,
        colTtls = Seq(Ttl.ColTtl("value", 7, lit(0.0))))
      .select(col("event_id"), col("age_days"), col("value"),
        col("value_expired"))
      .as[(Long, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(!out.contains(5L))                 // age 21 >= rowTtl: dropped
    assert(out(4L) === ((4L, 20L, 0.0, 1L)))  // kept, cell expired
    assert(out(3L) === ((3L, 7L, 0.0, 1L)))   // exact column boundary
    assert(out(2L) === ((2L, 6L, 2.0, 0L)))   // one ns inside
    assert(out(1L) === ((1L, 0L, 1.0, 0L)))
  }

  test("ttl rollup collapses aged rows per day, passes recent rows raw") {
    val day = 86400000000000L
    val asOf = 100L * day
    val ev = Seq(
      // two aged rows same type+day -> one rolled row summing both
      ("a", 1L, asOf - 10L * day, 1.5),
      ("a", 2L, asOf - 10L * day + 1L, 2.5),
      // aged row, other type
      ("b", 3L, asOf - 8L * day, 4.0),
      // exact boundary: age 7 IS aged (>= days)
      ("a", 4L, asOf - 7L * day, 8.0),
      // 1 ns inside: raw
      ("a", 5L, asOf - 7L * day + 1L, 16.0),
      ("a", 6L, asOf, 32.0))
      .toDF("event_type", "event_id", "ts", "value")
    val out = Ttl.rollupExpired(ev.withColumn("as_of", lit(asOf)),
        col("ts"), col("as_of"), days = 7,
        keys = Seq("event_type"), idCol = "event_id", value = col("value"))
      .select(col("event_type"), col("is_rolled"), col("event_id"),
        col("n_rows"), col("sum_value"))
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(out === Set(
      ("a", 1L, -1L, 2L, 4.0),   // two aged rows, one day bucket
      ("b", 1L, -1L, 1L, 4.0),
      ("a", 1L, -1L, 1L, 8.0),   // boundary row rolled
      ("a", 0L, 5L, 1L, 16.0),   // 1 ns inside stays raw
      ("a", 0L, 6L, 1L, 32.0)))
    // invariant: nothing lost — raw + rolled account for every row
    val tot = Ttl.rollupExpired(ev.withColumn("as_of", lit(asOf)),
        col("ts"), col("as_of"), days = 7,
        keys = Seq("event_type"), idCol = "event_id", value = col("value"))
      .agg(sum(col("n_rows"))).as[Long].head()
    assert(tot === 6L)
  }

  test("cluster split never places near-dup cluster members in different splits") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("c35_cluster_split")(spark, dir)
    val perCluster = out.groupBy(col("cluster"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
      .count()
    assert(perCluster === 0L, "a near-dup cluster spans two splits: leakage")
    // the planted near-dups guarantee at least one multi-doc cluster,
    // so the assertion above is not vacuous
    val multi = out.groupBy(col("cluster")).count().filter(col("count") > 1)
    assert(multi.count() > 0L)
  }

  test("interval sweep: peak concurrency and union length with touch/nest/gap") {
    // key a: [0,10) [5,20) [20,30)  — overlap 5-10 (peak 2), 20 touches
    //        20 (open end: NOT concurrent), union = [0,30) = 30
    // key b: [0,100) [10,20) [40,50) — nested (peak 2), union = 100
    // key c: [0,5) [10,15)           — gap, peak 1, union = 10
    val iv = Seq(
      ("a", 1L, 0L, 10L), ("a", 2L, 5L, 20L), ("a", 3L, 20L, 30L),
      ("b", 4L, 0L, 100L), ("b", 5L, 10L, 20L), ("b", 6L, 40L, 50L),
      ("c", 7L, 0L, 5L), ("c", 8L, 10L, 15L))
      .toDF("k", "id", "s", "e")
    val peak = Series.maxIntersections(iv, "k", col("s"), col("e"), col("id"))
      .as[(String, Long)].collect().toMap
    assert(peak === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    val cov = Series.intervalLengthSum(iv, "k", col("s"), col("e"), col("id"))
      .as[(String, Long)].collect().toMap
    assert(cov === Map("a" -> 30L, "b" -> 100L, "c" -> 10L))
  }

  test("gopher gate sets each failure bit independently") {
    def gate(text: String, minTokens: Long = 3L): (Long, Long) = {
      val df = Seq(Tuple1(text)).toDF("text")
      val cols = TextAnalysis.gopherGateCols(col("text"), minTokens = minTokens)
        .map { case (n, c) => c.as(n) }
      val r = df.select(cols: _*).select("reasons", "keep")
        .as[(Long, Long)].head()
      r
    }
    // clean doc: enough tokens, normal lengths, >= 2 stopwords
    assert(gate("the cat sat with the dog and that hat") === ((0L, 1L)))
    // bit 0: too few tokens (still has stopwords + sane lengths)
    assert(gate("the with")._1 === 1L)
    // bit 1: mean token length out of range (all 1-char tokens)
    assert((gate("a b c d e f g h i j the of with")._1 & 2L) === 2L)
    // bit 2: alphabetic ratio < 80% (numbers dominate)
    assert((gate("1 2 3 4 5 6 7 8 the of 11 12 13 14 15")._1 & 4L) === 4L)
    // bit 3: symbol ratio > 10%
    assert((gate("the of cat dog :: == ++ !! ?? ~~")._1 & 8L) === 8L)
    // bit 4: fewer than 2 distinct stopwords
    assert((gate("cat dog fish bird mouse wolf")._1 & 16L) === 16L)
  }

  test("lttb pins first/last points and keeps the spike in a middle bucket") {
    // 6 points, 3 buckets of 2: bucket 0 -> first point, bucket 2 ->
    // last point, bucket 1 -> the visual extreme (y=100 spike at x=20
    // forms a far larger triangle with the flat neighbor-bucket
    // averages than y=10 at x=30 does).
    val ev = Seq(
      ("a", 1L, 0L, 0L), ("a", 2L, 10L, 0L),
      ("a", 3L, 20L, 100L), ("a", 4L, 30L, 10L),
      ("a", 5L, 40L, 0L), ("a", 6L, 50L, 0L)
    ).toDF("k", "id", "x", "y")
    val got = Series.lttb(ev, "k", xMs = col("x"), yUnits = col("y"),
        tieBreak = col("id"), buckets = 3)
      .select(col("bucket"), col("n_points"), col("pick_id"),
        col("x_ms"), col("y_units"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (0L, 2L, 1L, 0L, 0L),
      (1L, 2L, 3L, 20L, 100L),
      (2L, 2L, 6L, 50L, 0L)))
  }

  test("dailyVectors densifies onto the calendar with zeros, order by date") {
    val perDay = Seq(
      ("a", java.sql.Date.valueOf("2026-01-01"), 3L),
      ("a", java.sql.Date.valueOf("2026-01-03"), 5L),
      ("b", java.sql.Date.valueOf("2026-01-02"), 7L)
    ).toDF("k", "d", "c")
    val spine = Seq((java.sql.Date.valueOf("2026-01-01"),
      java.sql.Date.valueOf("2026-01-03"))).toDF("d0", "d1")
    val got = Series.dailyVectors(perDay, "k", "d", "c", spine)
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    assert(got === Map(
      "a" -> List(3.0, 0.0, 5.0),
      "b" -> List(0.0, 7.0, 0.0)))
  }

  test("lttb with fewer points than buckets still pins first and last") {
    val ev = Seq(("k", 1L, 0L, 5L), ("k", 2L, 100L, 7L))
      .toDF("k", "id", "x", "y")
    val got = Series.lttb(ev, "k", col("x"), col("y"), col("id"), buckets = 3)
      .select(col("bucket"), col("pick_id"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((0L, 1L), (1L, 2L)))
  }
}
