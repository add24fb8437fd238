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
