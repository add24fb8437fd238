package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 4-dim corpus with a planted neighbor for query 1.
  private val vecs = Seq(
    (1L, Array(1.0, 0.0, 0.0, 0.0)),
    (2L, Array(0.99, 0.1, 0.0, 0.0)),  // nearest to 1
    (3L, Array(0.0, 1.0, 0.0, 0.0)),
    (4L, Array(0.0, 0.0, 1.0, 0.0)),
    (5L, Array(-1.0, 0.0, 0.0, 0.0))   // antipode of 1
  ).toDF("vec_id", "v")

  test("brute-force top-k ranks the planted neighbor first, antipode last") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 1L),
        "vec_id", "v", k = 4)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("corpus_id")).toSeq == Seq(2L, 3L, 4L, 5L))
    assert(out(0).getAs[Double]("cosine_sim") > 0.99)
    assert(out(3).getAs[Double]("cosine_sim") == -1.0)
  }

  test("lsh bucket: identical vectors share a bucket, antipodes never do") {
    val b = vecs.select(col("vec_id"),
      Similarity.lshBucket(col("v"), planes = 8, dim = 4).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) != b(5L)) // every plane flips sign for the antipode
  }

  test("lsh top-k only scores bucket-mates and never pairs a query with itself") {
    val out = Similarity.lshTopK(vecs, vecs, "vec_id", "v",
      k = 5, planes = 4, dim = 4).collect()
    assert(out.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("corpus_id")))
  }
}
