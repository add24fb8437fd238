package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.functions.Fns
import graft.operators.{EventFlattener, EventRouter, SchemaEvolution}

/** End-to-end Structured Streaming re-expression of the reference's
  * worker loop (reference: src/main.ts — queue.process → per-type
  * Bulker buffers → repeated bulk INSERT):
  *
  *   readStream (file source standing in for the Redis queue; the
  *   container is zero-egress) → flatten/enrich/transform →
  *   foreachBatch{ route to per-event-type parquet tables with schema
  *   evolution }.
  *
  * What the reference gets from Bull + bulkers, streaming gives
  * structurally: micro-batches ARE the bulk inserts
  * (maxFilesPerTrigger ≙ TAKE_UP_TO_PER_BATCH), the checkpoint is the
  * re-enqueue-on-crash story (no manual SIGTERM dance), and
  * backpressure is trigger-paced instead of a bounded in-memory buffer
  * that throws `errors.bulker_full`.
  */
object EventPipeline {

  /** Pluggable queue-source seam (reference north star: a Redis/Kafka
    * consumer feeding the worker — main.ts:540's `queue.process`).
    * Anything that yields a streaming DataFrame of event rows drops
    * in: the file source below is the zero-egress stand-in; a Kafka
    * reader is `FrameEventSource(spark.readStream.format("kafka")
    * .option("subscribe", topic)...load().select(<decode body>))` —
    * no pipeline code changes.
    *
    * Reference-knob mapping (so a queue deployment translates):
    * - `NB_CONCURRENCY` (main.ts:162, parallel queue reads) ≙ source
    *   partition count × `spark.sql.shuffle.partitions` — parallelism
    *   is cluster-sized, not worker-config-sized.
    * - `TAKE_UP_TO_PER_BATCH` / `BULKER_MAX_LENGTH` (main.ts:153,
    *   bounded per-INSERT batch + buffer cap) ≙ trigger pacing:
    *   `maxFilesPerTrigger` (files) or `maxOffsetsPerTrigger` (Kafka)
    *   bound each micro-batch, and backpressure is structural — the
    *   source is never drained faster than the sink commits, so there
    *   is no `errors.bulker_full` overflow path to re-enqueue. */
  trait EventSource {
    def load(spark: SparkSession): DataFrame
  }

  /** File-backed queue stand-in: each arriving file ≙ a batch of
    * queue jobs; `maxFilesPerTrigger` ≙ TAKE_UP_TO_PER_BATCH. */
  final case class FileEventSource(schema: StructType, dir: String,
                                   maxFilesPerTrigger: Int = 1) extends EventSource {
    def load(spark: SparkSession): DataFrame =
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(dir)
  }

  /** Adapter for an already-built streaming frame (MemoryStream in
    * tests, a Kafka/Redis reader in a real deployment). */
  final case class FrameEventSource(df: DataFrame) extends EventSource {
    def load(spark: SparkSession): DataFrame = df
  }

  /** `dlqDir = Some(dir)` dead-letters invalid rows (missing routing
    * key / unparseable body) instead of dropping them — the reference
    * never loses a row (main.ts:463-514); replay them later with
    * `EventRouter.replayDlq`. None keeps the drop behavior. */
  case class Config(
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 1,
      transform: EventFlattener.RowTransform = EventFlattener.defaultTransform,
      dlqDir: Option[String] = None)

  /** The enrichment applied to each micro-batch (shared with tests and
    * with the batch path, so batch/streaming parity is testable). */
  def enrich(events: DataFrame, transform: EventFlattener.RowTransform): DataFrame = {
    val withMeta = EventFlattener.withMetadata(
      events,
      receivedAt = Fns.nanosToTimestamp(col("ts")),
      sentAt = current_timestamp(),
      idCols = Seq(col("event_type"), col("event_id")))
    transform(withMeta)
  }

  /** Start the pipeline. AvailableNow drains everything present and
    * stops — the batch-refill shape; Trigger.ProcessingTime is the
    * always-on worker (BULK_REPEAT_INTERVAL_SEC). */
  def start(spark: SparkSession, schema: StructType, cfg: Config,
            availableNow: Boolean = true): StreamingQuery =
    start(spark, FileEventSource(schema, cfg.inputDir, cfg.maxFilesPerTrigger),
      cfg, availableNow)

  /** Same pipeline over any [[EventSource]] (the queue seam). */
  def start(spark: SparkSession, source: EventSource, cfg: Config,
            availableNow: Boolean): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = source.load(spark)

    val writer = stream.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // reference main.ts:463-514: a row is never lost — invalid rows
        // dead-letter (when configured) with a reason + attempt counter
        val valid = cfg.dlqDir match {
          case Some(dlqOut) =>
            val (ok, dlq) =
              if (batch.columns.contains("props"))
                EventRouter.splitDlq(batch, "props")
              else EventRouter.splitDlq(batch)
            dlq.withColumn("stream_batch_id", lit(batchId))
              .write.mode("append").parquet(dlqOut)
            ok
          case None =>
            batch.filter(col("event_type").isNotNull &&
              length(col("event_type")) > 0)
        }
        val enriched = enrich(valid, cfg.transform)
          .filter(col("event_type").isNotNull && length(col("event_type")) > 0)
          .withColumn("stream_batch_id", lit(batchId))
        enriched
          .repartition(col("event_type"))
          .sortWithinPartitions(col("event_type"), col("sent_at"))
          .write.mode("append")
          .partitionBy("event_type")
          .parquet(cfg.outputDir)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Read one routed destination "table" back. */
  def readTable(spark: SparkSession, cfg: Config, eventType: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(cfg.outputDir)
      .filter(col("event_type") === eventType)

  /** Escape an event_type for use as a directory name (the same job
    * partitionBy's escaping does on the non-evolving path): anything
    * outside [A-Za-z0-9_-] percent-encodes, so "page/view" or "../x"
    * cannot escape or nest under the output root. */
  private[graft] def escapeType(t: String): String =
    t.map {
      case c if c.isLetterOrDigit || c == '_' || c == '-' => c.toString
      case c => f"%%${c.toInt}%02X"
    }.mkString

  /** The reference's full loop: per micro-batch, flatten the free-form
    * JSON body, route by event_type, and evolve EACH type's table
    * schema independently (CREATE on first batch, ADD COLUMN nullable,
    * widen-to-String — reference batch-client:492-568).
    *
    * Per-type tables with divergent schemas can't share one
    * `partitionBy` write, so inside each (small, bounded) micro-batch
    * the router fans out per present type — exactly the reference's
    * one-bulker-per-type shape, with the 100 TB work still done by the
    * streaming partition-parallelism within each write.
    *
    * Delivery is at-least-once at the table level: a crash between a
    * type's append and the checkpoint commit replays the batch, and
    * replays APPEND (parquet has no upsert). `message_id` is a content
    * hash and `stream_batch_id` is stamped on every row, so downstream
    * exact-once reads are `dropDuplicates("message_id")` — a filter,
    * not a fix-up job — or a MERGE when the sink is transactional.
    *
    * Flattened JSON keys that would collide with the envelope columns
    * (the kept source columns and the enrichment columns) are dropped
    * via the reserved-keys mechanism, reference-style — a props key
    * named "event_id" must not shadow the envelope's event_id. */
  def startEvolving(spark: SparkSession, schema: StructType, cfg: Config,
                    jsonCol: String = "props",
                    availableNow: Boolean = true): StreamingQuery =
    startEvolving(spark,
      FileEventSource(schema, cfg.inputDir, cfg.maxFilesPerTrigger),
      cfg, jsonCol, availableNow)

  /** Same evolving pipeline over any [[EventSource]] (the queue seam). */
  def startEvolving(spark: SparkSession, source: EventSource, cfg: Config,
                    jsonCol: String, availableNow: Boolean): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = source.load(spark)
    val enrichmentCols = Seq("received_at", "sent_at", "message_id",
      "timestamp", "stream_batch_id")
    val writer = stream.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val valid = batch
          .filter(col("event_type").isNotNull && length(col("event_type")) > 0)
          .persist()
        try {
          if (!valid.isEmpty) {
            val keep = valid.columns.filterNot(_ == jsonCol).toSeq
            val reserved = EventFlattener.defaultReserved ++ keep ++ enrichmentCols
            val flat = EventFlattener.flatten(valid, jsonCol, keep = keep,
              opts = EventFlattener.Options(reserved = reserved))
            val enriched = enrich(flat, cfg.transform)
              .withColumn("stream_batch_id", lit(batchId))
              .persist()
            try {
              val types = enriched.select(col("event_type")).distinct()
                .collect().map(_.getString(0))
              types.foreach { t =>
                SchemaEvolution.evolveAppend(spark,
                  enriched.filter(col("event_type") === t).drop("event_type"),
                  s"${cfg.outputDir}/event_type=${escapeType(t)}")
              }
            } finally { enriched.unpersist(); () }
          }
        } finally { valid.unpersist(); () }
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Read one evolving per-type table back (schema-merged). */
  def readEvolvingTable(spark: SparkSession, cfg: Config, eventType: String): DataFrame =
    SchemaEvolution.readEvolved(spark,
      s"${cfg.outputDir}/event_type=${escapeType(eventType)}")
}
