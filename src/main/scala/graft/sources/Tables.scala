package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed loaders for the driver-generated test tables.
  *
  * One quirk: `events.ts` is epoch NANOS by contract — every query's
  * time arithmetic is integer math over that long. The driver's
  * generator has shipped it both as parquet TIMESTAMP(NANOS) (Spark 4
  * reads it only with `spark.sql.legacy.parquet.nanosAsLong`, which
  * surfaces the column as a BIGINT of epoch nanos) and as
  * TIMESTAMP(MICROS) (surfaces as a timestamp type). We normalize
  * both shapes to the epoch-nanos BIGINT here so callers don't have
  * to know which vintage of testdata is on disk. The DuckDB oracles
  * are invariant to this: `epoch_ns(ts)` reads the same nanos off
  * either physical type.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Read-plan memo: `spark.read.parquet` re-lists the path and
    * re-reads a footer for the schema on EVERY call — pure driver-side
    * metadata work (~10-40 ms) that the 239-query suite paid 1-4× per
    * query on the same ten static tables. Memoizing the analyzed READ
    * PLAN per (session, dir, table) is what a catalog table gives for
    * free (Spark caches file indexes for catalog reads the same way);
    * no DATA is cached — every action still scans parquet. Keyed by
    * session so a restarted session never reuses plans bound to a
    * stopped one. The test tables are immutable by contract (queries
    * write only under their own temp dirs, never through Tables). */
  private val planMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (sys.env.get("SPARK_GRAFT_TABLE_MEMO").contains("0")) fresh(spark, dir, name)
    else {
      // bound the memo: a library consumer cycling many short-lived
      // sessions must not retain every stopped session through its
      // cached plans (plans hold their session). 256 ≈ 25 sessions ×
      // 10 tables; a rare full reset just re-reads footers once.
      if (planMemo.size > 256) planMemo.clear()
      planMemo.computeIfAbsent((spark, dir, name), _ => fresh(spark, dir, name))
    }

  private def fresh(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** events.ts → epoch-nanos BIGINT regardless of the physical type
    * on disk (in place, column order preserved). Micros→nanos is an
    * exact ×1000; session tz is UTC so the NTZ cast is identity. */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case Some(LongType) | None => df
      case Some(other) =>
        throw new IllegalStateException(
          s"events.ts has unexpected type $other — expected a " +
            "timestamp or an epoch-nanos long")
    }

  /** Events from JSON-lines files — the wire shape the reference's
    * queue carries (one JSON job per line). Schema inferred unless
    * given; pairs with EventFlattener for the free-form body. */
  def eventsFromJsonl(spark: SparkSession, path: String,
                      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val reader = spark.read
    schema.fold(reader)(reader.schema).json(path)
  }

  /** On-disk bytes of a test table — Hadoop FS so any scheme the
    * session can read also sizes (local file, HDFS, object store). */
  def tableBytes(spark: SparkSession, dir: String, name: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  /** Broadcast hint that a SCALING table must not outgrow: hint only
    * while the table's on-disk footprint is under `maxBytes` (64 MB
    * parquet ≈ a few hundred MB in-memory build relation — comfortably
    * inside a 1 GB driver slice), otherwise hand the plan back to
    * Catalyst/AQE untouched (sort-merge, or AQE's own post-filter
    * broadcast conversion if the RUNTIME size qualifies).
    *
    * Why not hint unconditionally: a `broadcast()` hint is FORCED —
    * Spark obeys it regardless of size, and a TPC-H-scaling dim
    * (customer/supplier/part grow linearly with SF) that measured as a
    * nice map-side join at sf0.1 becomes a driver-OOM collect at
    * sf100+ (measured here: b2's hinted customer broadcast was
    * 3 M rows at sf100 — the build alone dominated the query). Why not
    * drop the hint entirely: below the threshold the hint beats AQE's
    * post-hoc conversion because the scan-side shuffle never happens
    * at all (b22's doc records the 8 s gap). The size check reads one
    * FS content summary — no data scan, deterministic for a given
    * dir.
    *
    * The gate is INTENTIONALLY conservative: it measures the FULL
    * table's on-disk footprint even though callers pass pruned
    * projections (b22's 2-column part, b92's 2-column customer) whose
    * build relation would broadcast comfortably past it. Full-table
    * bytes are a stable upper bound that needs no per-projection size
    * model; in the band where the gate under-hints, AQE's runtime
    * post-shuffle conversion still picks the broadcast up. */
  def broadcastIfSmall(spark: SparkSession, dir: String, name: String,
                       df: DataFrame,
                       maxBytes: Long = 64L << 20): DataFrame =
    if (tableBytes(spark, dir, name) <= maxBytes)
      org.apache.spark.sql.functions.broadcast(df)
    else df

  def events(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
}
