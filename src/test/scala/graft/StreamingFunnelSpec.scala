package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{Event, StreamingAnalytics}

/** The streaming funnel must agree with the batch DP on the same
  * events — random data, two micro-batches, keyed state carrying the
  * chains across the batch boundary. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  test("streaming funnel levels equal the batch windowFunnel on random data") {
    val rnd = new scala.util.Random(23)
    val types = Array("s", "c", "p", "x")
    val rows = (1 to 300).map { i =>
      Event(i.toLong, (i * 10 + rnd.nextInt(5)).toLong,
        rnd.nextInt(10).toLong + 1, types(rnd.nextInt(types.length)), 0.0)
    }.sortBy(e => (e.ts, e.event_id)) // global ts order => per-user order
    val W = 400L

    val batch = graft.operators.Funnel.windowFunnel(
        rows.toDF(), "user_id", "ts", "event_id",
        Seq(col("event_type") === "s", col("event_type") === "c",
          col("event_type") === "p"), W)
      .as[(Long, Long)].collect().toMap

    val dir = tmpDir("sfunnel")
    val (b1, b2) = rows.splitAt(150)
    b1.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")
    b2.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")

    val stream = spark.readStream.schema(rows.toDF().schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in").as[Event]
    val q = StreamingAnalytics.funnelStream(stream, Seq("s", "c", "p"), W)
      .toDF("user_id", "funnel_level")
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$dir/ck")
      .format("memory").queryName("sfunnel")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // update mode re-emits per batch: last emission per user wins
    val streamed = spark.table("sfunnel")
      .groupBy(col("user_id"))
      .agg(max(col("funnel_level")).as("funnel_level"))
      .as[(Long, Long)].collect().toMap
    // batch emits every user seen; stream too (level 0 users included)
    assert(streamed === batch)
  }

  test("cross-batch straggler OLDER than the chain start cannot advance the funnel") {
    // batch 1: step-1 event at ts=100s; batch 2: a LATE step-2 event at
    // ts=50s — it happened BEFORE the recorded chain start, so no s→c
    // funnel exists. Without the lower time bound the negative delta
    // passes the window check and the level wrongly becomes 2
    // (overcounting — the docstring promises stragglers only undercount)
    val ns = 1000000000L
    val b1 = Seq(Event(1L, 100L * ns, 1L, "s", 0.0))
    val b2 = Seq(Event(2L, 50L * ns, 1L, "c", 0.0))
    val dir = tmpDir("sfunnel_late")
    b1.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")
    b2.toDF().coalesce(1).write.mode("append").parquet(s"$dir/in")
    val stream = spark.readStream.schema(b1.toDF().schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in").as[Event]
    val q = StreamingAnalytics.funnelStream(stream, Seq("s", "c"), 400L * ns)
      .toDF("user_id", "funnel_level")
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$dir/ck")
      .format("memory").queryName("sfunnel_late")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val lvl = spark.table("sfunnel_late")
      .agg(max(col("funnel_level"))).collect()(0).getLong(0)
    assert(lvl == 1L,
      s"straggler older than the chain start advanced the funnel to $lvl")
  }
}
