package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the query set
  * against a single scan of the corpus (queries are small by
  * construction; the corpus side never shuffles).
  *
  * Scale path: random-hyperplane LSH — each vector gets a small bucket
  * signature; search touches only bucket-mates. Hyperplanes are derived
  * from md5 so every executor (and every round) regenerates the exact
  * same planes with no state to ship.
  */
object Similarity {

  /** Brute-force cosine top-k: every query vector against the corpus.
    * One broadcast join + one window; deterministic tie-break on id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     roundScale: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        Fns.cosine(col("qv"), col("cv"), roundScale).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 hyperplanes from md5 — plane j, dimension i.
    * private[graft] so the oracle generator can inline the same
    * constants into its SQL mirror. */
  private[graft] def planeSign(j: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$i".getBytes("UTF-8"))
    if ((d(0) & 1) == 1) 1.0 else -1.0
  }

  /** LSH bucket signature: sign bit per hyperplane, packed to a long. */
  def lshBucket(vec: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { j =>
      val plane = array((0 until dim).map(i => lit(planeSign(j, i))): _*)
      when(Fns.dotD(vec, plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF (inverted-file) ANN. Centroids are a deterministic id-stride
    * sample of the corpus (training-free; swap in k-means centroids at
    * will — the plumbing is identical). Assignment is relational: one
    * broadcast of the K centroids against a single corpus scan, argmax
    * cosine via a per-vector window (O(N·K) — the IVF assignment cost
    * by definition). Search probes only the query's cell, so scoring
    * touches ~corpus/K candidates per query. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, stride: Long = 100,
              roundScale: Int = 4): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val cents = corpus.filter(col(idCol) % stride === 0)
      .select(col(idCol).as("cent_id"), col(vecCol).cast("array<double>").as("centv"))
    require(!cents.isEmpty,
      s"no centroids: no corpus id is divisible by stride=$stride — " +
        "lower the stride (an empty centroid set would make every result empty)")
    def assign(df: DataFrame, id: String, out: String): DataFrame = {
      val w = Window.partitionBy(col(id))
        .orderBy(Fns.cosine(col(out), col("centv"), roundScale).desc, col("cent_id"))
      df.select(col(id), col(vecCol).cast("array<double>").as(out))
        .crossJoin(broadcast(cents))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col(id), col(out), col("cent_id").as("cell"))
    }
    val c = assign(corpus, idCol, "cv").withColumnRenamed(idCol, "corpus_id")
    val q = assign(queries, idCol, "qv").withColumnRenamed(idCol, "query_id")
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), col("cell"),
        Fns.cosine(col("qv"), col("cv"), roundScale).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: candidates share a bucket; top-k within bucket.
    * Misses across bucket boundaries are the approximation; planes=8
    * → 256 buckets → ~corpus/256 candidates per query. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 8, dim: Int = 64,
              roundScale: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes, dim))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), planes, dim))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), col("bucket"),
        Fns.cosine(col("qv"), col("cv"), roundScale).as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
