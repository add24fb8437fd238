package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Prices the served-index contract c104 oracle-checks: Q query
  * batches answered by per-call [[Similarity.ivfTopK]] (each call
  * pays the O(N·K) corpus assignment) vs ONE [[Similarity.buildIndex]]
  * + Q assignment-free [[Similarity.searchIndex]] calls. Identical
  * results asserted in-run (row-set equality per batch), so the
  * artifact can't quietly compare different answers.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ServedAnnBench [Q]
  * Emits one JSON line (same contract as graft.Bench).
  */
object ServedAnnBench {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0).toInt else 8
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables(spark, sfDir, "embeddings")
    def batch(i: Int): DataFrame =
      emb.filter(col("vec_id") >= i * 8L && col("vec_id") < (i + 1) * 8L)
    // Order-insensitive STRONG digest over the FULL row (rank, cell and
    // cosine included): sum of xxhash64 over every column. A linear
    // (count, sum(f(ids))) checksum ignores rank/cell/score and can
    // collide, so diverged served results could slip past the require().
    // Hashes are folded mod a prime before summing: ANSI mode (Spark 4's
    // default) throws on long-sum overflow, and full-range 64-bit hashes
    // overflow after a handful of rows.
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
          sum(pmod(xxhash64(col("query_id"), col("corpus_id"), col("cell"),
            col("rank"), col("cosine_sim")), lit(1000000007L))))
        .collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // warmup: one untimed search absorbs JVM/codegen/scan init
    Similarity.ivfTopK(emb, batch(0), "vec_id", "embedding", k = 5).count()
    val (perCall, perCallSec) = time {
      (0 until q).map(i => checksum(
        Similarity.ivfTopK(emb, batch(i), "vec_id", "embedding", k = 5)))
    }
    val (served, servedSec) = time {
      val idx = Similarity.buildIndex(emb, "vec_id", "embedding")
      try (0 until q).map(i => checksum(Similarity.searchIndex(idx, batch(i), k = 5)))
      finally idx.release()
    }
    require(perCall == served,
      s"served results diverged from per-call: $perCall vs $served")
    def ms3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"served_ann_speedup","value":${ms3(perCallSec / servedSec)},"unit":"x","per_call_sec":${ms3(perCallSec)},"served_sec":${ms3(servedSec)},"n_batches":$q,"results_identical":true,"sf":"$sfDir"}""")
    spark.stop()
  }
}
