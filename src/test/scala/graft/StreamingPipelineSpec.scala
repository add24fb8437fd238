package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventPipeline

/** A11: end-to-end Structured Streaming — readStream → flatten/enrich →
  * foreachBatch route to per-type parquet tables (reference src/main.ts
  * worker loop; the checkpoint replaces its SIGTERM re-enqueue dance). */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def eventRows(ids: Range, eventType: String): Seq[(Long, Long, Long, String, Double, String)] =
    ids.map(i => (i.toLong, 1700000000000000000L + i * 1000000000L, i.toLong % 7,
      eventType, i * 1.5, s"""{"k":$i}"""))

  test("pipeline drains available input, routes per type, checkpoints increments") {
    val base = tmpDir("stream")
    val in = s"$base/in"; val out = s"$base/out"; val ck = s"$base/ck"
    val cfg = EventPipeline.Config(in, out, ck)

    // batch 1: two types + one null-type row (must be dropped)
    val b1 = (eventRows(0 until 20, "click") ++ eventRows(20 until 30, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .unionAll(Seq((99L, 1700000000000000000L, 0L, null.asInstanceOf[String], 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    b1.coalesce(1).write.mode("append").parquet(in)

    EventPipeline.start(spark, b1.schema, cfg).awaitTermination()

    val routed = spark.read.parquet(out)
    assert(routed.filter(col("event_type") === "click").count() == 20)
    assert(routed.filter(col("event_type") === "purchase").count() == 10)
    assert(routed.count() == 30) // null-type row dropped
    // enrichment applied inside the stream
    assert(routed.columns.contains("message_id") && routed.columns.contains("timestamp"))

    // batch 2 arrives later: same checkpoint → only the new file processed
    eventRows(30 until 35, "click")
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(in)
    EventPipeline.start(spark, b1.schema, cfg).awaitTermination()

    val after = spark.read.parquet(out)
    assert(after.filter(col("event_type") === "click").count() == 25) // 20 + 5, no replay
    assert(after.count() == 35)

    // routed table is readable per type (the "one bulker = one table" view)
    val clicks = EventPipeline.readTable(spark, cfg, "click")
    assert(clicks.select("event_id").distinct().count() == 25)
  }

  test("debugTee appends one compact trace line per STORED row (DEBUG_STORE_LOG)") {
    val base = tmpDir("stream_tee")
    val cfg = EventPipeline.Config(s"$base/in", s"$base/out", s"$base/ck",
      debugTee = Some(s"$base/tee"))
    val rows = (eventRows(0 until 12, "click") ++ eventRows(12 until 15, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      // a dropped (null-type) row must NOT be traced: the reference
      // logs at store time, not at receive time
      .unionAll(Seq((99L, 1700000000000000000L, 0L,
        null.asInstanceOf[String], 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    rows.coalesce(1).write.mode("append").parquet(s"$base/in")
    EventPipeline.start(spark, rows.schema, cfg).awaitTermination()

    val tee = spark.read.json(s"$base/tee")
    assert(tee.count() == 15L) // stored rows only, null-type excluded
    assert(tee.columns.sorted.toSeq ==
      Seq("received_at", "stream_batch_id", "type"))
    assert(tee.filter(col("type") === "click").count() == 12L)
    assert(tee.filter(col("received_at").isNull).count() == 0L)
    // the tee must not perturb the real output
    assert(spark.read.parquet(s"$base/out").count() == 15L)
  }
}
