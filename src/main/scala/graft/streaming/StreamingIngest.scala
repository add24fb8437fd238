package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** Streaming ingestion dedup — the streaming face of c76's
  * cross-corpus operator: each micro-batch of incoming documents is
  * flagged against a STATIC reference corpus (yesterday's training
  * set), and the per-doc flags append to a parquet log keyed by
  * stream batch id (replay-idempotent: re-processing a batch rewrites
  * the same rows, the a9/a12 disposition convention).
  *
  * Scale contract inherited from [[Dedup.crossCorpusFlags]]: the band
  * join crosses batch×ref only, so per-trigger cost scales with the
  * micro-batch; the reference contributes its banded keys, which a
  * production pipeline precomputes once per corpus release. The
  * reference DataFrame is resolved ONCE here and reused across
  * micro-batches (foreachBatch closes over the same plan — Spark
  * re-reads files but never re-derives the lineage).
  */
object StreamingIngest {

  /** Start the flagging stream. `availableNow` drains what's present
    * and stops (the batch-refill shape); otherwise it runs on the
    * default micro-batch trigger. */
  def flagAgainstReference(docs: DataFrame, ref: DataFrame,
                           idCol: String, textCol: String,
                           outDir: String, checkpointDir: String,
                           threshold: Double = 0.5,
                           availableNow: Boolean = true): StreamingQuery = {
    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Dedup.crossCorpusFlags(batch, ref, idCol, textCol,
            threshold = threshold)
          .withColumn("stream_batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
