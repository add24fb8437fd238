package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Event, StreamingAnalytics}

/** Makes "bounded state by construction" CHECKABLE: the bounded-state
  * streaming twins assert output parity in StreamingAnalyticsSpec, but
  * nothing there pins state SIZE across a long stream. These tests
  * feed 100 micro-batches — far more batches than keys — and assert
  * the state store's row count (the `stateOperators.numRowsTotal`
  * metric Spark reports per progress update) tracks the KEY count,
  * never the batch count. A state leak (e.g. keying on something
  * batch-varying, or un-capped per-key growth surfacing as row
  * splits) fails fast here long before it would OOM a real stream.
  * SCALE.md §streaming cites this spec as the boundedness pin. */
class StreamingStateBoundSpec extends SparkSpec {
  import spark.implicits._

  private val ns = 1000000000L

  /** state rows per progress snapshot, oldest→newest (one per batch). */
  private def stateRowCounts(
      q: org.apache.spark.sql.streaming.StreamingQuery): Seq[Long] =
    q.recentProgress.toSeq.map(_.stateOperators.map(_.numRowsTotal).sum)
      .filter(_ > 0)

  test("decayStream: 100 micro-batches, state rows == live users (one O(1) triple each), not batch count") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val users = 7
    val q = StreamingAnalytics.decayStream(in.toDS(), tauNs = 86400L * ns)
      .writeStream.outputMode("update")
      .format("memory").queryName("decay_bound").start()
    try {
      (0 until 100).foreach { b =>
        in.addData(Event(b.toLong, b.toLong * ns, (b % users).toLong,
          "click", 1.0))
        q.processAllAvailable()
      }
      val counts = stateRowCounts(q)
      assert(counts.nonEmpty, "no state-operator progress recorded")
      assert(counts.max <= users,
        s"state grew past the key count: max ${counts.max} rows > $users users")
      assert(counts.last == users,
        s"expected one state triple per user, got ${counts.last}")
    } finally q.stop()
  }

  test("uniqUpToStream: 100 micro-batches of NEW users, state rows == (type, day) groups and counts saturate at n+1") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val n = 3
    val day = 86400L * ns
    // 2 types x 3 days = 6 groups; every event carries a NEVER-SEEN
    // user id, so an un-capped distinct set would grow 100 ids deep —
    // the cap keeps each group's state at <= n+1 ids and the report
    // pinned to n+1
    val types = Seq("click", "view")
    val q = StreamingAnalytics.uniqUpToStream(in.toDS(), n = n)
      .writeStream.outputMode("update")
      .format("memory").queryName("uupto_bound").start()
    try {
      (0 until 100).foreach { b =>
        in.addData(Event(b.toLong, (b % 3) * day, 1000L + b,
          types(b % 2), 1.0))
        q.processAllAvailable()
      }
      val counts = stateRowCounts(q)
      assert(counts.nonEmpty, "no state-operator progress recorded")
      assert(counts.max <= 6,
        s"state grew past the group count: max ${counts.max} rows > 6 groups")
      assert(counts.last == 6,
        s"expected one capped set per (type, day), got ${counts.last}")
      // ~100 distinct users flowed through; every group reports n+1
      val last = spark.table("uupto_bound")
        .groupBy("event_type", "event_date")
        .agg(org.apache.spark.sql.functions.max("uniq_upto").as("u"))
        .collect()
      assert(last.length == 6)
      assert(last.forall(_.getAs[Long]("u") == n + 1L),
        "saturated groups must report exactly n+1")
    } finally q.stop()
  }

  test("ohlcStream: 100 micro-batches into 2 live bars, state rows == bars") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val hour = 3600L * ns
    val q = StreamingAnalytics.ohlcStream(in.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("ohlc_bound").start()
    try {
      (0 until 100).foreach { b =>
        // all events land in hour 0 or hour 1 of one type: 2 bars ever
        in.addData(Event(b.toLong, (b % 2) * hour + b * ns, 1L,
          "trade", b * 1.0))
        q.processAllAvailable()
      }
      val counts = stateRowCounts(q)
      assert(counts.nonEmpty && counts.max <= 2,
        s"state grew past the bar count: max ${counts.max} rows > 2 bars")
      assert(counts.last == 2)
    } finally q.stop()
  }

  test("transitionStream: 100 micro-batches, state rows == users (one last-event triple each)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val users = 5
    val q = StreamingAnalytics.transitionStream(in.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_bound").start()
    try {
      (0 until 100).foreach { b =>
        in.addData(Event(b.toLong, b.toLong * ns, (b % users).toLong,
          if (b % 2 == 0) "a" else "b", 1.0))
        q.processAllAvailable()
      }
      val counts = stateRowCounts(q)
      assert(counts.nonEmpty && counts.max <= users,
        s"state grew past the user count: max ${counts.max} rows > $users")
      assert(counts.last == users)
      // 100 events over 5 users -> 95 edges emitted, none lost
      assert(spark.table("trans_bound").count() == 95L)
    } finally q.stop()
  }
}
