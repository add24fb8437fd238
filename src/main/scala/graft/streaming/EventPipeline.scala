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

  case class Config(
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 1,
      transform: EventFlattener.RowTransform = EventFlattener.defaultTransform)

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
            availableNow: Boolean = true): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.inputDir)

    val writer = stream.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val enriched = enrich(batch, cfg.transform)
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

  /** The reference's full loop: per micro-batch, flatten the free-form
    * JSON body, route by event_type, and evolve EACH type's table
    * schema independently (CREATE on first batch, ADD COLUMN nullable,
    * widen-to-String — reference batch-client:492-568).
    *
    * Per-type tables with divergent schemas can't share one
    * `partitionBy` write, so inside each (small, bounded) micro-batch
    * the router fans out per present type — exactly the reference's
    * one-bulker-per-type shape, with the 100 TB work still done by the
    * streaming partition-parallelism within each write. Exactly-once:
    * the checkpoint tracks source progress; replayed batches rewrite
    * the same rows (message_id is a content hash, so downstream dedup
    * is a filter, not a fix-up job). */
  def startEvolving(spark: SparkSession, schema: StructType, cfg: Config,
                    jsonCol: String = "props",
                    availableNow: Boolean = true): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.inputDir)
    val writer = stream.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val valid = batch
          .filter(col("event_type").isNotNull && length(col("event_type")) > 0)
        if (!valid.isEmpty) {
          val keep = valid.columns.filterNot(_ == jsonCol).toSeq
          val flat = EventFlattener.flatten(valid, jsonCol, keep = keep)
          val enriched = enrich(flat, cfg.transform)
            .withColumn("stream_batch_id", lit(batchId))
          val types = enriched.select(col("event_type")).distinct()
            .collect().map(_.getString(0))
          types.foreach { t =>
            SchemaEvolution.evolveAppend(spark,
              enriched.filter(col("event_type") === t).drop("event_type"),
              s"${cfg.outputDir}/event_type=$t")
          }
        }
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Read one evolving per-type table back (schema-merged). */
  def readEvolvingTable(spark: SparkSession, cfg: Config, eventType: String): DataFrame =
    SchemaEvolution.readEvolved(spark, s"${cfg.outputDir}/event_type=$eventType")
}
