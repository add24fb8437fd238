package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.SchemaEvolution

/** JDBC warehouse sink — the SQL-catalog twin of the parquet evolve
  * path (reference: clickhouse-batch-client.class.ts:492-568, the
  * INSERT batcher + ALTER TABLE evolution). The parquet router proves
  * the evolution rules against parquet metadata; this sink proves
  * them against a REAL SQL catalog (embedded Derby in
  * JdbcEventSinkSpec — in-process, zero egress):
  *
  *  - new column → a real metadata-only `ALTER TABLE … ADD COLUMN`
  *    (nullable, the reference's CLICKHOUSE_ALTERED_COLUMN_NULLABLE
  *    default — existing rows surface NULL from the catalog itself);
  *  - widen-to-String → a real mutation. Derby cannot ALTER a
  *    numeric column to VARCHAR in place, so the sink does what
  *    ClickHouse's `MODIFY COLUMN … String` mutation does
  *    internally: rewrite the table at the new type into a staged
  *    table, then swap names in the catalog (`RENAME TABLE`, two
  *    statements on one connection). Rare by construction — the
  *    reference only ever risks this one ALTER;
  *  - everything else → existing type wins (DateTime64→DateTime
  *    corner included), same `SchemaEvolution.merge` rules, one code
  *    path for both sinks.
  *
  * Scale shape: evolution DDL is driver-side and bounded by table
  * count; the INSERT append is Spark's JDBC writer (one INSERT batch
  * per partition, executor-parallel). The URL is the seam — any
  * JDBC-speaking warehouse slots in; only `derbyType` is
  * dialect-specific DDL.
  */
object JdbcEventSink {

  /** graftnet URLs carry the driver class so Spark's DriverRegistry
    * can load [[GraftNetDriver]] inside executor JVMs. */
  private def props(url: String): Properties = {
    val p = new Properties
    if (url.startsWith(GraftNet.UrlPrefix)) {
      GraftNetDriver.ensureRegistered()
      p.setProperty("driver", classOf[GraftNetDriver].getName)
    }
    p
  }

  /** Existing table schema, or None if the table doesn't exist. */
  def tableSchema(spark: SparkSession, url: String,
                  table: String): Option[StructType] =
    try Some(spark.read.jdbc(url, table, props(url)).schema)
    catch { case _: Exception => None }

  /** Spark→Derby DDL types for ADD COLUMN (Spark's own JDBC writer
    * handles CREATE TABLE). VARCHAR(32672) is Derby's max. */
  private def derbyType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType | ShortType | ByteType => "INTEGER"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case _ => "VARCHAR(32672)"
  }

  private def withConn[A](url: String)(f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def qi(id: String): String = "\"" + id + "\""

  /** Cap the INSERT fan-out: each write partition opens its own
    * warehouse connection (Spark's JDBC writer), so a 32-shuffle-
    * partition micro-batch filtered per type would dial the catalog
    * 32× per table per batch — connection handshakes dominate small
    * batches (measured ~10 s of pure setup on a17's 10 evolve rounds
    * over the network warehouse). The reference bounds this the same
    * way: one bulker channel per table, READ_MAX_CONCURRENCY-bounded
    * (main.ts:40-77). Default 8 parallel inserts per table append;
    * tune with spark.graft.jdbc.maxWritePartitions (raise it when the
    * warehouse genuinely takes more parallel INSERT channels; 0
    * disables the cap, same contract as the queue publisher's). */
  private def capped(spark: SparkSession, df: DataFrame): DataFrame = {
    val maxW = spark.conf.get("spark.graft.jdbc.maxWritePartitions", "8").toInt
    // coalesce is a no-op when df already has <= maxW partitions
    if (maxW > 0) df.coalesce(maxW) else df
  }

  /** Append `df` to `table`, evolving the table's catalog schema with
    * the reference's merge rules. Returns the table's schema after
    * the append. Table names must be plain identifiers
    * (letters/digits/underscore). */
  def evolveAppend(spark: SparkSession, df: DataFrame, url: String,
                   table: String): StructType =
    tableSchema(spark, url, table) match {
      case None =>
        // first batch CREATEs the table at the batch schema, exactly
        // like the parquet twin (and the reference's CREATE path)
        capped(spark, df).write.jdbc(url, table, props(url))
        df.schema
      case Some(ex) =>
        val target = SchemaEvolution.merge(ex, df.schema)
        val widened = ex.fields
          .filter(f => target(f.name).dataType != f.dataType).map(_.name)
        val added = target.fields
          .filterNot(f => ex.fieldNames.contains(f.name))
        if (widened.nonEmpty) {
          // the mutation path: old + new aligned at the widened type,
          // staged, then swapped in the catalog
          val old = spark.read.jdbc(url, table, props(url))
          val combined = SchemaEvolution.align(old, target)
            .unionByName(SchemaEvolution.align(df, target))
          val stage = table + "__graft_stage"
          val retired = table + "__graft_old"
          withConn(url) { c =>
            val st = c.createStatement()
            Seq(stage, retired).foreach { t =>
              try { st.execute(s"DROP TABLE $t"); () }
              catch { case _: java.sql.SQLException => () } // absent: fine
            }
          }
          capped(spark, combined).write.jdbc(url, stage, props(url))
          withConn(url) { c =>
            val st = c.createStatement()
            st.execute(s"RENAME TABLE $table TO $retired")
            st.execute(s"RENAME TABLE $stage TO $table")
            st.execute(s"DROP TABLE $retired")
            ()
          }
        } else {
          if (added.nonEmpty) withConn(url) { c =>
            val st = c.createStatement()
            added.foreach { f =>
              st.execute(s"ALTER TABLE $table ADD COLUMN " +
                s"${qi(f.name)} ${derbyType(f.dataType)}")
            }
          }
          capped(spark, SchemaEvolution.align(df, target))
            .write.mode("append").jdbc(url, table, props(url))
        }
        target
    }

  def readTable(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, props(url))

  /** SQL-safe table name for an event type (the per-type table
    * convention, JDBC side). INJECTIVE, unlike a plain
    * replaceAll("[^a-z0-9_]", "_"): that folded "page view",
    * "Page-View", and "page_view" into ONE table, silently unioning
    * unrelated types' rows and cross-evolving their prop columns.
    * Here [a-z0-9] passes through and EVERY other char — including
    * '_' and uppercase — encodes as "_hh" (lowercase hex of the char
    * code; "_u{hex}_" for codepoints past 0xff). '_' never appears
    * bare, so the encoding is prefix-free: distinct types always get
    * distinct tables. Common clean types ("click", "purchase"…) keep
    * their natural names. */
  def tableName(eventType: String): String =
    "ev_" + eventType.flatMap { c =>
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') c.toString
      else if (c <= 0xff) f"_${c.toInt}%02x"
      else f"_u${c.toInt}%x_"
    }

  /** One micro-batch's routed JDBC write: each present event type
    * appends (with evolution) to its own table. The per-type loop is
    * the reference's own one-bulker-per-type shape — INSERT batches
    * are per-table by nature, so unlike the parquet fast path there
    * is no single-job variant to ride; type count bounds the loop.
    *
    * The per-type appends run OVERLAPPED from a small thread pool
    * (guide §2.6 — independent jobs; each type owns its own table, so
    * the schema reads, DDL and INSERT batches never touch another
    * type's state, and the warehouse serves each connection on its own
    * thread by design). The r13 event-log probe measured the serial
    * loop as a17's dominant term: 5 types × (schema read + DDL + a
    * ~0.1 s INSERT job + ~0.2 s of driver planning) ≈ 2 s per
    * micro-batch of pure latency ladder. Overlap makes it the wall of
    * the slowest type. `spark.graft.jdbc.maxParallelTables` bounds the
    * in-flight appends (default 8 — the same bound as the per-append
    * INSERT fan-out above, so the worst case is 64 concurrent INSERT
    * channels; 1 restores the serial loop; lower it when the warehouse
    * rations connections). Exceptions propagate exactly as before
    * (fail the batch). */
  def routeAndAppend(spark: SparkSession, batch: DataFrame, url: String,
                     typeCol: String = "event_type",
                     knownTypes: Option[Seq[String]] = None): Map[String, StructType] = {
    // callers that already collected the batch's distinct types (the
    // streaming prelude's emptiness gate) pass them in — one driver
    // round-trip per micro-batch instead of two
    val types = knownTypes.map(_.toArray).getOrElse(
      batch.select(col(typeCol)).distinct()
        .collect().map(_.getString(0))) // bounded by table count
    val maxPar = math.max(1, math.min(types.length,
      spark.conf.get("spark.graft.jdbc.maxParallelTables", "8").toInt))
    if (maxPar <= 1 || types.length <= 1)
      types.map { t =>
        t -> evolveAppend(spark,
          batch.filter(col(typeCol) === t).drop(typeCol), url, tableName(t))
      }.toMap
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(maxPar)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val futs = types.toSeq.map { t =>
          scala.concurrent.Future {
            t -> evolveAppend(spark,
              batch.filter(col(typeCol) === t).drop(typeCol), url, tableName(t))
          }
        }
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(futs),
          scala.concurrent.duration.Duration.Inf).toMap
      } finally { pool.shutdown(); () }
    }
  }
}
