package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.functions.Fns
import graft.operators.{EventFlattener, EventRouter, SchemaEvolution}
import graft.sources.JdbcEventSink

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
  /** `sinkPing = Some(f)` is the connection-watchdog seam (reference
    * main.ts:244-260 pings ClickHouse and main.ts:464 gates inserts on
    * `lastPingShowsDisconnectedDestination`): evaluated once per
    * micro-batch BEFORE any table write. A false ping — or a table
    * write that throws — diverts the affected rows to `dlqDir` with a
    * reason + attempt counter instead of failing the stream; recovery
    * is the existing a12 replay path. Without a `dlqDir` the failure
    * propagates (fail-the-batch, checkpoint replays — the pre-watchdog
    * behavior). */
  /** `compactEvery = Some(n)` runs [[graft.operators.Compactor]] over
    * the routed table after every n-th micro-batch, INSIDE foreachBatch
    * — the maintenance loop that keeps streaming fragmentation bounded
    * (the reference's MergeTree background merges,
    * bulker.class.ts:66-117, where the engine that owns the parts owns
    * their merges). Running at the micro-batch boundary makes the
    * merge atomic w.r.t. the stream's own appends BY CONSTRUCTION (no
    * snapshot-then-swap lost-append race: foreachBatch serializes the
    * two), and external readers see staged-swap visibility — the old
    * file set or the new one, never a half-merged union
    * (StreamingCompactionSpec pins both). `onCompact` observes each
    * merge's Stats (tests and ops counters). */
  /** `debugTee = Some(dir)` appends a compact JSON-lines trace of every
    * STORED row — (type, received_at, stream_batch_id) — next to the
    * real write, the reference's DEBUG_STORE_LOG ops affordance
    * (main.ts:140-142, 181-199: fs.appendFile of per-row
    * {type, received_at, flags} summaries at insert time). Spark-form:
    * a distributed JSON append per micro-batch (never a driver-side
    * collect), so the tee scales with the stream it shadows. */
  case class Config(
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 1,
      transform: EventFlattener.RowTransform = EventFlattener.defaultTransform,
      dlqDir: Option[String] = None,
      sinkPing: Option[() => Boolean] = None,
      compactEvery: Option[Int] = None,
      compactSortCol: String = "sent_at",
      onCompact: Option[graft.operators.Compactor.Stats => Unit] = None,
      debugTee: Option[String] = None)

  /** The DEBUG_STORE_LOG trace write (see [[Config.debugTee]]). */
  private def traceBatch(enriched: DataFrame, tee: Option[String]): Unit =
    tee.foreach { dir =>
      enriched.select(col("event_type").as("type"), col("received_at"),
          col("stream_batch_id"))
        .write.mode("append").json(dir)
    }

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
        traceBatch(enriched, cfg.debugTee)
        // the in-stream maintenance merge (see Config.compactEvery):
        // serialized with the append above, so no append can land
        // between the compaction's snapshot and its swap
        cfg.compactEvery.foreach { n =>
          val outPath = new org.apache.hadoop.fs.Path(cfg.outputDir)
          val fs = outPath.getFileSystem(
            batch.sparkSession.sparkContext.hadoopConfiguration)
          if ((batchId + 1) % n == 0 && fs.exists(outPath)) {
            val st = graft.operators.Compactor.compact(batch.sparkSession,
              cfg.outputDir, partitionCol = "event_type",
              sortCol = cfg.compactSortCol)
            cfg.onCompact.foreach(_(st))
          }
        }
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Read one routed destination "table" back. */
  def readTable(spark: SparkSession, cfg: Config, eventType: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(cfg.outputDir)
      .filter(col("event_type") === eventType)

  /** Escape an event_type for use as a directory name, using the SAME
    * character set Hive/Spark's own `escapePathName` uses on the
    * non-evolving `partitionBy` path — control chars plus the
    * filesystem/URI specials below percent-encode; everything else
    * (including non-ASCII letters) passes through raw, exactly as
    * `partitionBy` writes it. Parity matters: Spark's partition
    * unescaping decodes each `%XX` as ONE char, so escapes must be
    * single-byte (the old form emitted `%4E2D` for '中', which
    * partition discovery mangled to "N2D") and raw chars must match
    * what `partitionBy` itself would leave raw. '/' and '\' are in
    * the set, so "page/view" or "../x" still cannot escape or nest
    * under the output root (the dots stay inside one path segment). */
  // ..: Spark's own set starts at 1 — NUL passes raw there,
  // so it must here too (the parity spec pins this against the engine)
  private val escapeNeeded: Set[Char] =
    (0x01 to 0x1f).map(_.toChar).toSet + 0x7f.toChar ++ "\"#%'*/:=?\\{[]^".toSet

  private[graft] def escapeType(t: String): String =
    t.flatMap { c =>
      if (escapeNeeded(c)) f"%%${c.toInt}%02X" else c.toString
    }

  /** The reference's full loop: per micro-batch, flatten the free-form
    * JSON body, route by event_type, and evolve EACH type's table
    * schema independently (CREATE on first batch, ADD COLUMN nullable,
    * widen-to-String — reference batch-client:492-568).
    *
    * Schema evolution is per-type METADATA (driver-side merges); the
    * DATA write is ONE routed `partitionBy` job per micro-batch for
    * every cast-free type, staged then file-moved into the per-type
    * tables ([[writeEvolvedBatch]]) — the batch router's one-shuffle
    * shape, not a per-type job loop. Only a table needing a cast or
    * widen rewrite falls back to its own aligned append.
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

  /** Enrichment columns both evolving sinks reserve (one list — the
    * parquet and JDBC twins must never drift apart on it). */
  private val enrichmentCols = Seq("received_at", "sent_at", "message_id",
    "timestamp", "stream_batch_id")

  /** Watchdog divert: rows dead-letter with a reason + attempt counter
    * instead of failing the stream (reference main.ts:463-514). */
  private def divertToDlq(rows: DataFrame, reason: String, dlqDir: String,
                          batchId: Long): Unit =
    rows.withColumn("dlq_reason", lit(reason))
      .withColumn("retry_attempt", lit(1))
      .withColumn("stream_batch_id", lit(batchId))
      .write.mode("append").parquet(dlqDir)

  /** The shared per-batch prelude of BOTH evolving sinks (parquet and
    * JDBC — one body, so a change to the gate/flatten/enrich sequence
    * cannot silently apply to only one twin): keep routable rows, gate
    * on the sink ping (diverting the whole batch raw when the
    * destination reports down and a DLQ is configured — main.ts:464's
    * insert gate), flatten the JSON column, enrich, stamp the batch
    * id, then hand (rawValid, presentTypes, enriched) to the
    * sink-specific body. Skips the body for an empty or diverted
    * batch; manages the raw frame's persist lifetime around the body.
    *
    * The emptiness gate and the sinks' type discovery are ONE job: the
    * distinct event_type list is collected here (empty list == empty
    * batch) and handed to the body, instead of the old isEmpty action
    * PLUS a per-sink distinct — two fewer driver round-trips per
    * micro-batch, measured at ~0.3 s/trigger on the r13 event-log
    * probe. event_type is a kept passthrough column, so the list
    * collected pre-flatten equals the one the sinks saw post-flatten. */
  private def withRoutableBatch(batch: DataFrame, batchId: Long, cfg: Config,
      jsonCol: String)(body: (DataFrame, Seq[String], DataFrame) => Unit): Unit = {
    val valid = batch
      .filter(col("event_type").isNotNull && length(col("event_type")) > 0)
      .persist()
    try {
      val types = valid.select(col("event_type")).distinct()
        .collect().map(_.getString(0)).toSeq // bounded by table count
      if (types.nonEmpty) {
        if (cfg.dlqDir.isDefined && !cfg.sinkPing.forall(_())) {
          divertToDlq(valid, "destination_unhealthy", cfg.dlqDir.get, batchId)
        } else {
          val keep = valid.columns.filterNot(_ == jsonCol).toSeq
          val reserved = EventFlattener.defaultReserved ++ keep ++ enrichmentCols
          val flat = EventFlattener.flatten(valid, jsonCol, keep = keep,
            opts = EventFlattener.Options(reserved = reserved))
          val enriched = enrich(flat, cfg.transform)
            .withColumn("stream_batch_id", lit(batchId))
          body(valid, types, enriched)
          traceBatch(enriched, cfg.debugTee)
        }
      }
    } finally { valid.unpersist(); () }
  }

  /** Same evolving pipeline over any [[EventSource]] (the queue seam). */
  def startEvolving(spark: SparkSession, source: EventSource, cfg: Config,
                    jsonCol: String, availableNow: Boolean): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = source.load(spark)
    val writer = stream.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        withRoutableBatch(batch, batchId, cfg, jsonCol) {
          (valid, types, enrichedRaw) =>
          val enriched = enrichedRaw.persist()
          try {
            val onFail: Option[(Seq[String], Throwable) => Unit] =
              cfg.dlqDir.map { dlqOut => (failed: Seq[String], _: Throwable) =>
                divertToDlq(valid.filter(col("event_type").isin(failed: _*)),
                  "sink_write_failed", dlqOut, batchId)
              }
            writeEvolvedBatch(spark, enriched, types, cfg.outputDir,
              batchId, onFail)
          } finally { enriched.unpersist(); () }
        }
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** The reference's FULL path on real seams: any [[EventSource]] (in
    * production the `graft-queue` broker connector — the BullMQ
    * consumer's seat, main.ts:540) → flatten + type-infer + enrich →
    * per-event-type WAREHOUSE tables over JDBC with real catalog
    * evolution (clickhouse-batch-client.class.ts:492-568's CREATE /
    * ALTER TABLE ADD COLUMN / widen path, via
    * [[graft.sources.JdbcEventSink.routeAndAppend]]).
    *
    * Delivery is the same contract as the parquet twin: at-least-once
    * per micro-batch (checkpoint replays re-append), deduped
    * downstream on `message_id`; a clean checkpointed restart is
    * exactly-once because consumed broker offsets are committed.
    * The sinkPing gate dead-letters a batch raw when the warehouse
    * reports down (main.ts:464's insert gate) — replayable unchanged. */
  def startEvolvingJdbc(spark: SparkSession, source: EventSource, cfg: Config,
                        jdbcUrl: String, jsonCol: String = "props",
                        availableNow: Boolean = true): StreamingQuery = {
    val writer = source.load(spark).writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        withRoutableBatch(batch, batchId, cfg, jsonCol) {
          (_, types, enrichedRaw) =>
          // persist: routeAndAppend consumes the flatten+enrich plan
          // once per present type (and, overlapped, concurrently) —
          // without this each per-type append re-runs the projection
          // and re-plans its full lineage
          val enriched = enrichedRaw.persist()
          try {
            JdbcEventSink.routeAndAppend(spark, enriched, jdbcUrl,
              knownTypes = Some(types))
            ()
          }
          finally { enriched.unpersist(); () }
        }
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** One micro-batch's routed write with per-type schema evolution.
    *
    * Schema EVOLUTION is metadata: each present type's target schema
    * merges driver-side (a handful of parquet-footer reads, bounded by
    * table count — the reference's one-Bulker-per-type assumption).
    * The DATA write is one job whenever it can be: every type whose
    * append is cast-free — no existing column widens, every column
    * shared with its table already has the table's dtype (new columns
    * are metadata-only via mergeSchema, like evolveAppend's ADD
    * COLUMN) — rides a single salted-by-type `partitionBy` write to a
    * staging dir (the batch router's one-shuffle shape,
    * EventRouter.writeRouted), whose part files then MOVE into the
    * per-type tables driver-side. The batch crosses the cluster once
    * per trigger, not once per present type — at high type
    * cardinality the per-type loop serialized N jobs per micro-batch.
    *
    * Only a type whose table needs a cast or a widen rewrite (rare by
    * construction: the reference risks exactly one ALTER) falls back
    * to the per-type aligned `evolveAppend`.
    *
    * The staging dir lives under the output root with a `__` prefix,
    * which Spark's partition discovery ignores; a crash mid-move
    * replays the batch (at-least-once, deduped downstream by
    * `message_id` — same contract as before). NOTE the move is a
    * same-filesystem rename — O(1) on HDFS/local; on an object store
    * front it with a rename-capable committer or layer. */
  private[graft] def writeEvolvedBatch(spark: SparkSession, enriched: DataFrame,
                                       types: Seq[String], outputDir: String,
                                       batchId: Long,
                                       onWriteFailure: Option[(Seq[String], Throwable) => Unit] = None): Unit = {
    import org.apache.hadoop.fs.Path
    // a write failure either diverts the affected types' rows (the
    // sink watchdog) or propagates (fail-the-batch, checkpoint replays)
    def guarded(affected: Seq[String])(body: => Unit): Unit =
      try body catch {
        case scala.util.control.NonFatal(e) => onWriteFailure match {
          case Some(h) => h(affected, e)
          case None => throw e
        }
      }
    val batchSchema = StructType(enriched.drop("event_type").schema.fields)
    def tablePath(t: String) = s"$outputDir/event_type=${escapeType(t)}"
    // mergeSchema=true is LOAD-BEARING here: after a fast-path batch
    // added a column, only the newer files carry it — a single-footer
    // schema read could pick an older file, miss that column, classify
    // a type-changing batch as cast-free, and mix incompatible types
    // into one table (unreadable until manually repaired)
    val existing: Map[String, Option[StructType]] = types.map { t =>
      t -> (try Some(spark.read.option("mergeSchema", "true")
                       .parquet(tablePath(t)).schema)
            catch { case _: Exception => None })
    }.toMap
    def castFree(t: String): Boolean = existing(t) match {
      case None => true // first batch CREATEs the table at batch schema
      case Some(ex) =>
        val target = SchemaEvolution.merge(ex, batchSchema)
        ex.fields.forall(f => target(f.name).dataType == f.dataType) &&
          batchSchema.fields.filter(f => ex.fieldNames.contains(f.name))
            .forall(f => ex(f.name).dataType == f.dataType)
    }
    val (fast, slow) = types.partition(castFree)
    if (fast.nonEmpty) {
      val staging = s"$outputDir/__graft_stage_$batchId"
      var staged = false
      guarded(fast) {
        enriched.filter(col("event_type").isin(fast: _*))
          .repartition(col("event_type"))
          .sortWithinPartitions(col("event_type"), col("received_at"))
          .write.mode("overwrite").partitionBy("event_type").parquet(staging)
        staged = true
      }
      if (staged) {
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(staging), spark.sparkContext.hadoopConfiguration)
        fast.foreach { t =>
          guarded(Seq(t)) {
            val from = new Path(s"$staging/event_type=" +
              org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(t))
            val to = new Path(tablePath(t))
            if (!fs.exists(to) && !fs.mkdirs(to))
              throw new java.io.IOException(s"cannot create table dir $to")
            fs.listStatus(from).foreach { f =>
              if (f.getPath.getName.startsWith("part-") &&
                  !fs.rename(f.getPath, new Path(to, f.getPath.getName)))
                throw new java.io.IOException(
                  s"rename ${f.getPath} -> $to failed (destination unwritable?)")
            }
          }
        }
        fs.delete(new Path(staging), true); ()
      }
    }
    slow.foreach { t =>
      guarded(Seq(t)) {
        SchemaEvolution.evolveAppend(spark,
          enriched.filter(col("event_type") === t).drop("event_type"),
          tablePath(t))
      }
    }
  }

  /** Read one evolving per-type table back (schema-merged). */
  def readEvolvingTable(spark: SparkSession, cfg: Config, eventType: String): DataFrame =
    SchemaEvolution.readEvolved(spark,
      s"${cfg.outputDir}/event_type=${escapeType(eventType)}")
}
