package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The served (build-once) ANN index vs the per-call path: identical
  * results, assignment paid once. The driver row c104 oracle-checks
  * the served results at sf0.01; this spec pins the stronger claim —
  * served == per-call, row for row, for every batch sharing the index
  * — and the cache lifecycle (persisted while served, released after).
  */
class ServedAnnSpec extends SparkSpec {
  import spark.implicits._

  // 40 deterministic 4-dim vectors spread over the sphere octants, so
  // sqrt-stride seeding (stride=6) yields several non-empty cells.
  private lazy val corpus = (0L until 40L).map { i =>
    val a = (i % 7).toDouble + 1.0
    val b = (i % 5).toDouble - 2.0
    val c = (i % 3).toDouble - 1.0
    (i, Array(a, b, c, 1.0))
  }.toDF("vec_id", "v")

  private def rows(df: DataFrame): Seq[String] =
    df.orderBy("query_id", "rank").collect()
      .map(r => Seq("query_id", "corpus_id", "cell", "cosine_sim", "rank")
        .map(c => String.valueOf(r.getAs[Any](c))).mkString("|")).toSeq

  test("searchIndex == ivfTopK for every batch served from one index") {
    val idx = Similarity.buildIndex(corpus, "vec_id", "v", stride = 0)
    try {
      for (lo <- Seq(0L, 8L, 16L)) {
        val q = corpus.filter(col("vec_id") >= lo && col("vec_id") < lo + 4)
        val served = rows(Similarity.searchIndex(idx, q, k = 3))
        val percall = rows(Similarity.ivfTopK(corpus, q, "vec_id", "v", k = 3))
        assert(served === percall, s"batch at $lo diverged")
        assert(served.nonEmpty)
      }
    } finally idx.release()
  }

  test("refineIndex search == ivfTopKTrained (shared seed assignment)") {
    val idx0 = Similarity.buildIndex(corpus, "vec_id", "v", stride = 0)
    val idx1 = Similarity.refineIndex(corpus, idx0, iters = 1)
    try {
      val q = corpus.filter(col("vec_id") < 4)
      val served = rows(Similarity.searchIndex(idx1, q, k = 3))
      val percall = rows(Similarity.ivfTopKTrained(corpus, q, "vec_id", "v",
        k = 3, iters = 1))
      assert(served === percall)
      assert(served.nonEmpty)
    } finally { idx1.release(); idx0.release() }
  }

  test("buildIndex(iters=1) == refineIndex(buildIndex(0), 1)") {
    val direct = Similarity.buildIndex(corpus, "vec_id", "v", iters = 1)
    val seed = Similarity.buildIndex(corpus, "vec_id", "v")
    val staged = Similarity.refineIndex(corpus, seed, iters = 1)
    try {
      val q = corpus.filter(col("vec_id") < 4)
      assert(rows(Similarity.searchIndex(direct, q, k = 3)) ===
        rows(Similarity.searchIndex(staged, q, k = 3)))
    } finally { direct.release(); staged.release(); seed.release() }
  }

  test("appendToIndex: batch count and order never matter; centroids stay fixed") {
    val base = corpus.filter(col("vec_id") < 28)
    val add1 = corpus.filter(col("vec_id") >= 28 && col("vec_id") < 34)
    val add2 = corpus.filter(col("vec_id") >= 34)
    val q = corpus.filter(col("vec_id") < 4)
    def searched(appends: Seq[DataFrame]): Seq[String] = {
      val idx0 = Similarity.buildIndex(base, "vec_id", "v", stride = 6)
      val idx = appends.foldLeft(idx0)(Similarity.appendToIndex)
      try rows(Similarity.searchIndex(idx, q, k = 3)) finally idx.release()
    }
    val twoBatch = searched(Seq(add1, add2))
    assert(twoBatch === searched(Seq(add2, add1)), "append order changed results")
    assert(twoBatch === searched(Seq(add1.unionAll(add2))),
      "batch split changed results")
    assert(twoBatch.nonEmpty)
  }

  test("refineServed == refineIndex over the full corpus (compaction " +
       "after appends trains on appends too)") {
    val base = corpus.filter(col("vec_id") < 30)
    val idx0 = Similarity.buildIndex(base, "vec_id", "v", stride = 6)
    val idx = Similarity.appendToIndex(idx0, corpus.filter(col("vec_id") >= 30))
    val viaServed = Similarity.refineServed(idx, iters = 1)
    val viaCorpus = Similarity.refineIndex(corpus, idx, iters = 1)
    try {
      val q = corpus.filter(col("vec_id") < 4)
      val a = rows(Similarity.searchIndex(viaServed, q, k = 3))
      assert(a === rows(Similarity.searchIndex(viaCorpus, q, k = 3)))
      assert(a.nonEmpty)
    } finally { viaServed.release(); viaCorpus.release(); idx.release() }
  }

  test("index assignment is persisted while served and released after") {
    val idx = Similarity.buildIndex(corpus, "vec_id", "v")
    assert(idx.assigned.storageLevel.useMemory || idx.assigned.storageLevel.useDisk,
      "built index must pin its assignment (that IS the amortization)")
    idx.release()
    assert(idx.assigned.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE)
  }
}
