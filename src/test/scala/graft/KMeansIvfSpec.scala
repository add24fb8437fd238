package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Lloyd-refined IVF centroids: deterministic (decimal-exact means)
  * and actually better (refinement must not worsen the mean
  * vector-to-centroid similarity). */
class KMeansIvfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def meanCos(cents: org.apache.spark.sql.DataFrame): Double = {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").cast("array<double>").as("v"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("vid"))
      .orderBy(graft.functions.Fns.cosine(col("v"), col("centv"), 6).desc, col("cent_id"))
    emb.crossJoin(broadcast(cents))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .agg(avg(graft.functions.Fns.cosine(col("v"), col("centv"), 6)))
      .collect()(0).getDouble(0)
  }

  test("refinement is deterministic and does not worsen cell cohesion") {
    val emb = Tables(spark, dir, "embeddings")
    val seed = Similarity.seedCentroids(emb, "vec_id", "embedding", stride = 100)
    val once = Similarity.refineCentroids(emb, seed, "vec_id", "embedding")
    val again = Similarity.refineCentroids(emb, seed, "vec_id", "embedding")
    val a = once.orderBy("cent_id").collect().map(r =>
      (r.getLong(0), r.getAs[scala.collection.Seq[Double]]("centv").toSeq))
    val b = again.orderBy("cent_id").collect().map(r =>
      (r.getLong(0), r.getAs[scala.collection.Seq[Double]]("centv").toSeq))
    assert(a.toSeq == b.toSeq) // bit-identical across runs
    assert(meanCos(once) >= meanCos(seed) - 1e-9) // Lloyd never worsens
  }

  test("trained IVF returns top-k per query from the query's cell") {
    val emb = Tables(spark, dir, "embeddings")
    val out = Similarity.ivfTopKTrained(emb, emb.filter(col("vec_id") < 4),
      "vec_id", "embedding", k = 3, stride = 100, iters = 2)
    val got = out.collect()
    assert(got.nonEmpty && got.forall(_.getAs[Int]("rank") <= 3))
    assert(got.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("corpus_id")))
  }

  test("sqrtStride gives K ~ sqrt(N) and matches floor(sqrt(N)) exactly") {
    // the K ≈ √N sizing rule (centroid count scales WITH the corpus);
    // exact floor so the DuckDB mirror's CAST(FLOOR(SQRT(n)) AS BIGINT)
    // can never disagree, including at perfect squares
    assert(Similarity.sqrtStride(0) == 1)
    assert(Similarity.sqrtStride(1) == 1)
    assert(Similarity.sqrtStride(500) == 22)
    assert(Similarity.sqrtStride(529) == 23)   // perfect square boundary
    assert(Similarity.sqrtStride(528) == 22)
    assert(Similarity.sqrtStride(1000000) == 1000)
    assert(Similarity.sqrtStride(999999) == 999)
  }

  test("autoPlanes holds expected bucket size in (32, 64] and floors at 8") {
    // the LSH analogue of sqrtStride: planes = max(8, bitlen((N-1)/64)),
    // capped at 30 — integer-exact so the oracle's
    // least(30, greatest(8, length(bin((count(*)-1)//64)))) always agrees
    assert(Similarity.autoPlanes(0) == 8)
    assert(Similarity.autoPlanes(1) == 8)
    assert(Similarity.autoPlanes(2000) == 8)      // all shipped scales: 8
    assert(Similarity.autoPlanes(16384) == 8)     // 2^8 * 64 — boundary
    assert(Similarity.autoPlanes(16385) == 9)
    assert(Similarity.autoPlanes(20000) == 9)     // sf1p corpus
    assert(Similarity.autoPlanes(200000) == 12)   // sf10p corpus
    assert(Similarity.autoPlanes(Long.MaxValue) == 30)
    // expected bucket size N/2^p stays in (32, 64] past the floor
    for (n <- Seq(16385L, 99999L, 1000000L, 123456789L)) {
      val p = Similarity.autoPlanes(n)
      val exp = n.toDouble / (1L << p)
      assert(exp <= 64.0 && exp > 32.0, s"n=$n p=$p exp=$exp")
    }
  }

  test("lshTopK planes <= 0 derives autoPlanes and matches the explicit form") {
    val emb = Tables(spark, dir, "embeddings") // 500 vectors -> 8 planes
    val q = emb.filter(col("vec_id") < 4)
    val auto = Similarity.lshTopK(emb, q, "vec_id", "embedding", k = 3)
    val explicit = Similarity.lshTopK(emb, q, "vec_id", "embedding", k = 3,
      planes = 8)
    assert(auto.orderBy("query_id", "rank").collect().toSeq ==
      explicit.orderBy("query_id", "rank").collect().toSeq)
  }

  test("stride <= 0 derives the scale-aware stride from the corpus count") {
    val emb = Tables(spark, dir, "embeddings") // 500 vectors, ids 0..499
    val auto = Similarity.seedCentroids(emb, "vec_id", "embedding", stride = 0)
    val explicit = Similarity.seedCentroids(emb, "vec_id", "embedding", stride = 22)
    assert(auto.select("cent_id").collect().map(_.getLong(0)).sorted.toSeq ==
      explicit.select("cent_id").collect().map(_.getLong(0)).sorted.toSeq)
    // K grows with N: 23 cells at N=500 (ids 0,22,...,484), not a fixed 5
    assert(auto.count() == 23)
  }
}
