package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{Event, StreamingAnalytics}

/** The two streaming shapes SURVEY §4 promises: watermarked windowed
  * aggregation and flatMapGroupsWithState custom state — both driven
  * through real streams via the memory sink. */
class StreamingAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val ns = 1000000000L
  private def ev(id: Long, tsSec: Long, uid: Long, tpe: String, v: Double) =
    Event(id, tsSec * ns, uid, tpe, v)

  test("windowed rollup over a stream matches the same rollup over the batch") {
    val base = 1700000000L // aligned enough for 5-minute windows
    val rows = Seq(
      ev(1, base + 10, 1, "click", 1.0), ev(2, base + 20, 2, "click", 2.0),
      ev(3, base + 400, 1, "view", 3.0), ev(4, base + 700, 3, "click", 4.0))
    val dir = tmpDir("wroll")
    rows.toDF().write.parquet(s"$dir/in")

    val stream = spark.readStream.schema(rows.toDF().schema).parquet(s"$dir/in")
    val q = StreamingAnalytics.windowedRollup(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("wroll")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("wroll")
      .orderBy("window_start", "event_type").collect()
    val batch = StreamingAnalytics.windowedRollup(rows.toDF())
      .orderBy("window_start", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.length == 3) // (w0 click), (w1 view), (w2 click)
    assert(streamed(0).getAs[Long]("n_events") == 2)
  }

  test("native session_window: gap semantics incl. exact-boundary split; stream == batch == reference fold") {
    val gapS = 1800L
    val rows = Seq(
      // user 1: two events 100s apart, one exactly AT the gap boundary
      // (touching windows merge -> still session 1), then one 1s past
      // the boundary of the extended session -> session 2
      ev(1, 1000, 1, "click", 1.0), ev(2, 1100, 1, "click", 2.0),
      ev(3, 1100 + gapS, 1, "view", 4.0),
      ev(7, 1100 + 2 * gapS + 1, 1, "view", 64.0),
      // user 2: single event; user 3: two sessions far apart
      ev(4, 5000, 2, "view", 8.0),
      ev(5, 1000, 3, "click", 16.0), ev(6, 99000, 3, "click", 32.0))
    val dir = tmpDir("swroll")
    rows.toDF().write.parquet(s"$dir/in")

    // reference fold: new session when ts - prev > gap (exact-boundary
    // events merge — Spark coalesces touching windows)
    val expected = rows.groupBy(_.user_id).flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(_.ts)
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
        (acc, e) =>
          if (e.ts - acc.head.head.ts > gapS * ns) List(e) :: acc
          else (e :: acc.head) :: acc.tail
      }
      sessions.map { s =>
        (uid, s.map(_.ts).min / ns, s.size.toLong, s.map(_.value).sum)
      }
    }.toSet

    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"user_id", $"session_start_s", $"n_events",
        $"sum_value".cast("double"))
      .as[(Long, Long, Long, Double)].collect().toSet

    val batch = norm(StreamingAnalytics.sessionWindowRollup(rows.toDF()))
    assert(batch === expected)

    val stream = spark.readStream.schema(rows.toDF().schema).parquet(s"$dir/in")
    val q = StreamingAnalytics.sessionWindowRollup(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("swroll")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(norm(spark.table("swroll")) === expected)
  }

  test("session_window is ns-exact: a gap one NANOSECOND past the boundary splits") {
    // sub-µs boundary: flooring ns→µs made a (gap, gap+999ns] gap look
    // ≤ gap and merge — the sf1 sweep caught exactly this (spark=2
    // duck=1 on one session). The ns-as-µs time axis must split it.
    val gapNs = 1800L * 1000000000L
    val base = 1000L * 1000000000L
    import spark.implicits._
    val df = Seq(
      Event(1L, base, 1L, "click", 1.0),
      Event(2L, base + gapNs + 1L, 1L, "click", 2.0), // 1 ns past: split
      Event(3L, base, 2L, "click", 4.0),
      Event(4L, base + gapNs, 2L, "click", 8.0) // exactly AT: merge
    ).toDF()
    val out = StreamingAnalytics.sessionWindowRollup(df)
      .orderBy("user_id", "session_start_s")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (1L, 1L), (2L, 2L)),
      s"ns boundary semantics broken: $out")
  }

  test("streaming decayed sum matches the batch operator across micro-batch splits") {
    val day = 86400L
    val rows1 = Seq(
      ev(1, day * 0, 1, "click", 2.0), ev(2, day * 1, 1, "click", 3.0),
      ev(3, day * 0, 2, "view", 7.0))
    val rows2 = Seq(
      ev(4, day * 2, 1, "click", 5.0), ev(5, day * 3, 2, "view", 1.0))
    val dir = tmpDir("decay")
    rows1.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")
    rows2.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")

    val stream = spark.readStream.schema(rows1.toDF().schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in").as[Event]
    val q = StreamingAnalytics.decayStream(stream, tauNs = day * ns)
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$dir/ck")
      .format("memory").queryName("decay")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // last update per user ≡ the batch operator over the union
    val streamed = spark.table("decay")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("n_events").desc)))
      .filter(col("rk") === 1).drop("rk")
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("last_ts_s"),
          r.getAs[Double]("decayed_sum"))).toMap
    val batch = graft.operators.Stats.decayedSumAtLast(
        (rows1 ++ rows2).toDF(), Seq("user_id"), col("ts"), col("value"),
        tauNs = day * ns)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("last_ts_s"),
          r.getAs[Double]("decayed_sum"))).toMap
    assert(streamed.keySet == batch.keySet)
    for ((u, (n, t, s)) <- batch) {
      assert(streamed(u)._1 == n && streamed(u)._2 == t)
      // the telescoped fold equals the batch sum up to fp association
      assert(math.abs(streamed(u)._3 - s) < 1e-9, s"user $u")
    }
  }

  test("streaming uniqUpTo saturates at n+1 with bounded state and matches the batch cap") {
    val day = 86400L
    // day 0, type "click": users 1..4 across two batches (distinct 4);
    // day 1: users 1,1,2 (distinct 2); cap n=2 → report min(d, 3)
    val rows1 = Seq(
      ev(1, 10, 1, "click", 1.0), ev(2, 20, 2, "click", 1.0),
      ev(3, day + 10, 1, "click", 1.0), ev(4, day + 20, 1, "click", 1.0))
    val rows2 = Seq(
      ev(5, 30, 3, "click", 1.0), ev(6, 40, 4, "click", 1.0),
      ev(7, day + 30, 2, "click", 1.0))
    val dir = tmpDir("uupto")
    rows1.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")
    rows2.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")

    val stream = spark.readStream.schema(rows1.toDF().schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in").as[Event]
    val q = StreamingAnalytics.uniqUpToStream(stream, n = 2)
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$dir/ck")
      .format("memory").queryName("uupto")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // last update per key == least(countDistinct, n+1) over the union
    val last = spark.table("uupto")
      .groupBy("event_type", "event_date")
      .agg(max("uniq_upto").as("uniq_upto")) // counts only grow
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val batch = (rows1 ++ rows2).toDF()
      .groupBy(col("event_type"),
        date_format(graft.functions.Fns.nanosToTimestamp(col("ts")),
          "yyyy-MM-dd").as("event_date"))
      .agg(least(countDistinct(col("user_id")), lit(3L)).as("u"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(last == batch)
    assert(last.values.max == 3L) // day 0 saturated at n+1
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions, keeps open tails") {
    val batch1 = Seq(
      ev(1, 1000, 1, "click", 1.0), ev(2, 1100, 1, "click", 1.0),  // session A (user 1)
      ev(3, 10000, 1, "click", 1.0),                               // gap > 30min -> A closes
      ev(4, 2000, 2, "view", 1.0))                                 // user 2, stays open
    val batch2 = Seq(ev(5, 20000, 1, "click", 1.0))                // closes session B
    val dir = tmpDir("sess")
    // two files + maxFilesPerTrigger=1 -> two micro-batches in ONE query,
    // so keyed state carries across batches (memory sink can't resume
    // from a checkpoint, so a restart-based test isn't possible here)
    batch1.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")
    batch2.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")

    val stream = spark.readStream.schema(batch1.toDF().schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in").as[Event]
    val q = StreamingAnalytics.sessionize(stream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ck")
      .format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val out = spark.table("sessions").orderBy("user_id", "start_s").collect()
    // closed sessions only: A (events 1-2) and B (event 3, closed by
    // event 5); user 1's third session and user 2's only one stay open
    assert(out.length == 2)
    assert(out(0).getAs[Long]("user_id") == 1L)
    assert(out(0).getAs[Long]("start_s") == 1000L)
    assert(out(0).getAs[Long]("end_s") == 1100L)
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(1).getAs[Long]("start_s") == 10000L &&
      out(1).getAs[Long]("end_s") == 10000L)
  }

  test("sessionize: a cross-batch straggler must not move the session tail backwards") {
    // batch 1 establishes last=1000s; batch 2 delivers a straggler at
    // 500s (in-session) and an on-time event at 2400s. With plain
    // last=e.ts the straggler regresses last to 500, 2400-500 > gap
    // falsely splits one continuous session and emits (0..500); with
    // the max() guard last stays 1000, 2400-1000 <= gap, and NOTHING
    // closes — the session is still open
    val batch1 = Seq(ev(1, 0, 1, "click", 1.0), ev(2, 1000, 1, "click", 1.0))
    val batch2 = Seq(ev(3, 500, 1, "click", 1.0), ev(4, 2400, 1, "click", 1.0))
    val dir = tmpDir("sess_late")
    batch1.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")
    batch2.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")
    val stream = spark.readStream.schema(batch1.toDF().schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in").as[Event]
    val q = StreamingAnalytics.sessionize(stream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ck")
      .format("memory").queryName("sess_late")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("sess_late").collect()
    assert(out.isEmpty,
      s"straggler split a continuous session: ${out.mkString(", ")}")
  }

  test("streaming OHLC resolves open/close across micro-batch splits exactly like the batch ranks") {
    val hr = 3600L
    // hour 0 of "click": open arrives in batch TWO (earlier ts), close
    // tie on ts broken by the higher event_id, also cross-batch
    val rows1 = Seq(
      ev(5, 100, 1, "click", 10.0), ev(6, 900, 2, "click", 3.0),
      ev(7, hr + 10, 1, "view", 7.0))
    val rows2 = Seq(
      ev(2, 50, 3, "click", 20.0),  // new open (ts 50 < 100)
      ev(9, 900, 4, "click", 8.0),  // close: ties ts 900, id 9 > 6
      ev(8, hr + 5, 2, "view", 1.0))
    val dir = tmpDir("ohlc")
    rows1.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")
    rows2.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")

    val stream = spark.readStream.schema(rows1.toDF().schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
      .as[Event]
    val q = StreamingAnalytics.ohlcStream(stream)
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$dir/ck")
      .format("memory").queryName("ohlc")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val last = spark.table("ohlc")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"), col("h"))
          .orderBy(col("n").desc)))
      .filter(col("rk") === 1).drop("rk")
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("h")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("open"),
          r.getAs[Double]("high"), r.getAs[Double]("low"),
          r.getAs[Double]("close"), r.getAs[Double]("sum_value"))).toMap

    assert(last(("click", 0L)) == ((4L, 20.0, 20.0, 3.0, 8.0, 41.0)))
    // view hour 1: open id 8 (ts hr+5), close id 7 (ts hr+10)
    assert(last(("view", 1L)) == ((2L, 1.0, 7.0, 1.0, 7.0, 8.0)))
  }

  test("streaming transitions across micro-batch splits equal the batch lag edges") {
    // user 1's chain spans the batch boundary: a→b in batch 1, b→c
    // with the bridge edge b→c only derivable from state
    val rows1 = Seq(
      ev(1, 10, 1, "a", 1.0), ev(2, 20, 1, "b", 1.0),
      ev(3, 10, 2, "x", 1.0))
    val rows2 = Seq(
      ev(4, 30, 1, "c", 1.0), ev(5, 40, 1, "a", 1.0),
      ev(6, 20, 2, "x", 1.0))
    val dir = tmpDir("trans")
    rows1.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")
    rows2.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")

    val stream = spark.readStream.schema(rows1.toDF().schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in").as[Event]
    val q = StreamingAnalytics.transitionStream(stream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ck")
      .format("memory").queryName("trans")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("trans").groupBy("from_type", "to_type").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("count"))
      .toMap
    // batch reference: lag edges over the union per user
    assert(got == Map(("a", "b") -> 1L, ("b", "c") -> 1L,
      ("c", "a") -> 1L, ("x", "x") -> 1L))
  }

  test("streaming transitions: a LATE cross-batch event diverges from batch lag semantics (documented contract)") {
    // user 1 sees ts 10 ("a") and ts 30 ("c") in batch 1; ts 20 ("b")
    // arrives LATE in batch 2. The batch b89 lag over the union orders
    // by ts and yields a->b, b->c. The stream only sorts WITHIN a
    // micro-batch and keeps one (ts,id,type) triple of state, so it
    // emits a->c in batch 1 and then c->b when the stale row lands --
    // the in-order-across-batches contract transitionStream documents.
    // This spec pins the divergence; buffer by watermark upstream if
    // batch parity under disorder is required.
    val rows1 = Seq(ev(1, 10, 1, "a", 1.0), ev(3, 30, 1, "c", 1.0))
    val rows2 = Seq(ev(2, 20, 1, "b", 1.0)) // late: ts 20 < ts 30
    val dir = tmpDir("translate")
    rows1.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")
    rows2.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")

    val stream = spark.readStream.schema(rows1.toDF().schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in").as[Event]
    val q = StreamingAnalytics.transitionStream(stream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ck")
      .format("memory").queryName("translate")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("translate").groupBy("from_type", "to_type").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("count"))
      .toMap
    // streaming: a->c (batch 1), c->b (late arrival). Batch would say
    // a->b, b->c -- asserted different on purpose.
    assert(got == Map(("a", "c") -> 1L, ("c", "b") -> 1L))
    assert(got != Map(("a", "b") -> 1L, ("b", "c") -> 1L))
  }

  test("streaming growth accounting equals the batch b93 classification across micro-batch splits") {
    val day = 86400L // ev() takes seconds
    // user 1: day0 (b1), day1 (b2) -> retained needs STATE across the
    // split; day4 (b2) -> resurrected. user 2: single day in b1.
    val rows1 = Seq(ev(1, 10, 1, "a", 1.0), ev(2, day * 1 + 10, 1, "a", 1.0),
      ev(3, 20, 2, "x", 1.0))
    val rows2 = Seq(ev(4, day * 1 + 50, 1, "b", 1.0), // same day, no re-emit
      ev(5, day * 4 + 10, 1, "a", 1.0),
      ev(6, day * 2 + 10, 2, "x", 1.0)) // gap of 2 days -> resurrected
    val dir = tmpDir("growth")
    rows1.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")
    rows2.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")

    val stream = spark.readStream.schema(rows1.toDF().schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in").as[Event]
    val q = StreamingAnalytics.growthStream(stream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ck")
      .format("memory").queryName("growth")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("growth").collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("user_id")) ->
        r.getAs[String]("status")).toMap
    // batch b93 reference classification over the union
    assert(got == Map(
      (0L, 1L) -> "new", (1L, 1L) -> "retained", (4L, 1L) -> "resurrected",
      (0L, 2L) -> "new", (2L, 2L) -> "resurrected"))
    // exactly one row per (user, active day) — the same-day second
    // event in batch 2 must not re-emit
    assert(spark.table("growth").count() == 5)
  }
}
