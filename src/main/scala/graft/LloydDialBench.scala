package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Prices the Lloyd-refinement dial for the trained IVF index: recall
  * vs brute-force ground truth (c65b's planted regime and query
  * sample) and build cost at iters = 0, 1, 2 — each level reusing the
  * previous index's assignment via [[Similarity.refineIndex]], so the
  * marginal price of one more iteration is exactly one mean step +
  * one reassignment. Decides whether c7c/c65b should ship a second
  * iteration.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.LloydDialBench
  */
object LloydDialBench {
  def main(args: Array[String]): Unit = {
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
    // c65b's planted corpus + id-sampled query set, verbatim
    val base = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val n0 = base.count()
    val qStride = 40L * math.max(1L, n0 / 2000L)
    val emb = base.unionAll(base.filter(col("vec_id") % 40 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.02)).as("embedding")))
      .persist()
    val q = emb.filter(col("vec_id") >= 1000000L &&
      (col("vec_id") - 1000000L) % qStride === 0)
    val st = Similarity.sqrtStride(emb.count())
    def pairs(df: DataFrame) = df.select(col("query_id"), col("corpus_id"))
    val exact = pairs(Similarity.bruteForceTopK(emb, q, "vec_id", "embedding",
      k = 5, roundScale = 4)).persist()
    val nExact = exact.count()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def recallPpm(ann: DataFrame): Long = {
      val hits = exact.join(pairs(ann), Seq("query_id", "corpus_id"), "left_semi").count()
      hits * 1000000L / math.max(1L, nExact)
    }
    val (idx0, build0) = time {
      val i = Similarity.buildIndex(emb, "vec_id", "embedding", stride = st)
      i.assigned.count(); i
    }
    val (r0, search0) = time(recallPpm(Similarity.searchIndex(idx0, q, 5)))
    val (idx1, build1) = time {
      val i = Similarity.refineIndex(emb, idx0, iters = 1)
      i.assigned.count(); i
    }
    val (r1, search1) = time(recallPpm(Similarity.searchIndex(idx1, q, 5)))
    val (idx2, build2) = time {
      val i = Similarity.refineIndex(emb, idx1, iters = 1)
      i.assigned.count(); i
    }
    val (r2, search2) = time(recallPpm(Similarity.searchIndex(idx2, q, 5)))
    def ms3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"lloyd_dial","sf":"$sfDir","n_corpus":${n0 + n0 / 40},"n_exact":$nExact,"iters":[""" +
      s"""{"iters":0,"recall_ppm":$r0,"build_sec":${ms3(build0)},"search_sec":${ms3(search0)}},""" +
      s"""{"iters":1,"recall_ppm":$r1,"marginal_build_sec":${ms3(build1)},"search_sec":${ms3(search1)}},""" +
      s"""{"iters":2,"recall_ppm":$r2,"marginal_build_sec":${ms3(build2)},"search_sec":${ms3(search2)}}]}""")
    idx2.release(); idx1.release(); idx0.release(); exact.unpersist(); emb.unpersist()
    spark.stop()
  }
}
