package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventPipeline

/** Sink-health watchdog (reference main.ts:244-260 destination ping +
  * :464 insert gate + :558 worker recreation): a down or poisoned
  * destination must not fail the stream OR lose rows — affected rows
  * dead-letter with a reason and recover via the a12 replay path. */
class SinkWatchdogSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range, t: String): Seq[(Long, Long, Long, String, Double, String)] =
    ids.map(i => (i.toLong, 1700000000000000000L + i * 1000000000L, i.toLong % 5,
      t, i * 1.0, s"""{"k":$i}"""))

  test("failed ping gates the batch: everything dead-letters raw, stream survives, replay recovers") {
    val base = tmpDir("watchdog1")
    var up = false
    val cfg = EventPipeline.Config(s"$base/in", s"$base/out", s"$base/ck",
      dlqDir = Some(s"$base/dlq"), sinkPing = Some(() => up))
    val input = (rows(0 until 6, "click") ++ rows(6 until 10, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    input.coalesce(1).write.mode("append").parquet(cfg.inputDir)

    // destination down: the query COMPLETES (no exception), zero table writes
    EventPipeline.startEvolving(spark, input.schema, cfg).awaitTermination()
    val dlq = spark.read.parquet(s"$base/dlq")
    assert(dlq.count() == 10, "every row dead-letters when the ping fails")
    assert(dlq.select("dlq_reason").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("destination_unhealthy"))
    assert(!new java.io.File(s"$base/out").exists() ||
      new java.io.File(s"$base/out").list().isEmpty, "no table writes while down")

    // destination back: replay = DLQ rows re-enter the pipeline unchanged
    up = true
    spark.read.parquet(s"$base/dlq")
      .drop("dlq_reason", "retry_attempt", "stream_batch_id")
      .coalesce(1).write.mode("append").parquet(cfg.inputDir)
    EventPipeline.startEvolving(spark, input.schema, cfg).awaitTermination()

    assert(EventPipeline.readEvolvingTable(spark, cfg, "click").count() == 6)
    assert(EventPipeline.readEvolvingTable(spark, cfg, "purchase").count() == 4)
  }

  test("a poisoned table diverts ONLY its type; healthy types land; replay recovers to zero loss") {
    val base = tmpDir("watchdog2")
    val cfg = EventPipeline.Config(s"$base/in", s"$base/out", s"$base/ck",
      dlqDir = Some(s"$base/dlq"))
    val input = (rows(0 until 6, "click") ++ rows(6 until 10, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    input.coalesce(1).write.mode("append").parquet(cfg.inputDir)

    // poison: the click TABLE path exists as a plain file
    new java.io.File(s"$base/out").mkdirs()
    val poison = new java.io.File(s"$base/out/event_type=click")
    assert(poison.createNewFile())

    EventPipeline.startEvolving(spark, input.schema, cfg).awaitTermination()

    // purchase landed; click dead-lettered with the write-failure reason
    assert(EventPipeline.readEvolvingTable(spark, cfg, "purchase").count() == 4)
    val dlq = spark.read.parquet(s"$base/dlq")
    assert(dlq.count() == 6, "exactly the poisoned type's rows divert")
    assert(dlq.select("dlq_reason").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("sink_write_failed"))
    assert(dlq.select("event_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("click"))

    // heal the sink, replay the DLQ through the pipeline: zero loss
    assert(poison.delete())
    spark.read.parquet(s"$base/dlq")
      .drop("dlq_reason", "retry_attempt", "stream_batch_id")
      .coalesce(1).write.mode("append").parquet(cfg.inputDir)
    EventPipeline.startEvolving(spark, input.schema, cfg).awaitTermination()
    assert(EventPipeline.readEvolvingTable(spark, cfg, "click").count() == 6)
    assert(EventPipeline.readEvolvingTable(spark, cfg, "purchase").count() == 4)
  }
}
