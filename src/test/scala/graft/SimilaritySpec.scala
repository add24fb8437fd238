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

  test("semDedup: near-copy of a lower-id cluster-mate is flagged, rest kept") {
    // two clusters around the stride centroids 0 and 100:
    //   cell 0: 0 (centroid), 1 (near-copy of 0), 2 (same cell, cos < thr)
    //   cell 100: 100 (centroid), 101 (near-copy of 100)
    val vs = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(1.0, 0.01, 0.0, 0.0)),
      (2L, Seq(0.9, 0.44, 0.0, 0.0)),
      (100L, Seq(0.0, 1.0, 0.0, 0.0)),
      (101L, Seq(0.0, 1.0, 0.05, 0.0))
    ).toDF("vec_id", "v")
    val got = Similarity.semDedup(vs, "vec_id", "v",
        stride = 100L, threshold = 0.95)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cell"), r.getAs[Long]("cell_size"),
          r.getAs[Long]("is_dup"))))
      .toMap
    assert(got === Map(
      0L -> ((0L, 3L, 0L)),
      1L -> ((0L, 3L, 1L)),   // cos(0,1) ≈ 0.99995 ≥ 0.95
      2L -> ((0L, 3L, 0L)),   // cos(0,2) = 0.9 < 0.95: same cell, kept
      100L -> ((100L, 2L, 0L)),
      101L -> ((100L, 2L, 1L))))
  }

  test("semDedup never compares across cells (the documented trade)") {
    // a near-dup pair (cos ≈ 0.999) straddling the centroid boundary:
    // 3 assigns to cell 0, 4 to cell 100, so the pair is invisible —
    // the published SemDeDup recall trade, asserted here so a refactor
    // can't silently turn the within-cell join into an all-pairs scan.
    val vs = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (100L, Seq(0.0, 1.0, 0.0, 0.0)),
      (3L, Seq(0.72, 0.69, 0.0, 0.0)),
      (4L, Seq(0.69, 0.72, 0.0, 0.0))
    ).toDF("vec_id", "v")
    val got = Similarity.semDedup(vs, "vec_id", "v",
        stride = 100L, threshold = 0.9)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cell"), r.getAs[Long]("is_dup"))))
      .toMap
    assert(got(3L) === ((0L, 0L)) && got(4L) === ((100L, 0L)))
  }
}
