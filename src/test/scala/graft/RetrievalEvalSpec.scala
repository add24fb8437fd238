package graft

import org.apache.spark.sql.functions._

/** Round-7 batch 2: the rank-math kernels behind b104 (tie-corrected
  * AUC), c93 (RRF hybrid fusion), c94 (Kneser–Ney continuation
  * counts), and c95 (containment dedup) — each checked against a
  * hand-computable construction, not just the DuckDB mirror (the
  * mirror proves cross-engine agreement; these prove the math). */
class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("b104: rank-sum AUC equals the brute-force pairwise definition") {
    val out = SparkEntry.queries("b104_auc")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 5, "expected one AUC row per market segment")
    out.foreach { case (_, p, n, auc) =>
      assert(p > 0 && n > 0 && auc >= 0 && auc <= 1000000)
    }
    // brute-force the same statistic for one segment: over all
    // (pos, neg) pairs, wins + half-ties, floored to ppm
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === out.head._1)
      .select(round(col("o_totalprice") * 100).cast("long").as("s"),
        when(col("o_orderpriority") < "3", 1L).otherwise(0L).as("y"))
    val pos = o.filter(col("y") === 1).select(col("s").as("sp"))
    val neg = o.filter(col("y") === 0).select(col("s").as("sn"))
    val wins2 = pos.crossJoin(neg)
      .agg(sum(when(col("sp") > col("sn"), 2L)
        .when(col("sp") === col("sn"), 1L).otherwise(0L)).as("w2"))
      .collect().head.getLong(0)
    val brute = wins2 * 1000000L / (2L * pos.count() * neg.count())
    assert(out.head._4 == brute,
      s"rank-sum AUC ${out.head._4} != pairwise $brute")
  }

  test("c93: fusion ranks are consistent and PRF seeds rank semantically") {
    val rows = SparkEntry.queries("c93_prf_hybrid")(spark, sf).collect()
    assert(rows.length == 20)
    val rrf = rows.map(_.getLong(2))
    assert(rrf.zip(rrf.tail).forall { case (a, b) => a >= b },
      "rrf_micro must be non-increasing in rank")
    // a doc at lex rank r contributes exactly 1e6 div (60+r); the #1
    // fused doc must beat a single-list best (1e6 div 61)
    assert(rrf.head > 1000000L / 61,
      "top fused doc should appear in BOTH lists on this corpus")
    // the BM25 top-3 seeded the query vector: each must rank in the
    // semantic list too (its own embedding is 1/3 of the query mass)
    val seeded = rows.filter(r => r.getInt(3) >= 1 && r.getInt(3) <= 3)
    assert(seeded.nonEmpty && seeded.forall(_.getInt(4) > 0),
      "PRF seed docs missing from the semantic list")
  }

  test("c94: continuation counts on a hand corpus") {
    val docs = Seq("a b", "c b", "a c").toDF("text")
    val got = TrainingQueries8.knContinuation(docs, 10)._1
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // bigram types: (a,b) (c,b) (a,c) → N1+(·b)=2, N1+(·c)=1;
    // N1+(a·)=2, N1+(c·)=1; p_cont = n_left/3 types
    assert(got.toSeq == Seq(
      (1, "b", 2L, 0L, 666666L),
      (2, "c", 1L, 1L, 333333L)))
  }

  test("c97: knnGraph links cluster-mates, never crosses cells") {
    import graft.operators.Similarity
    // two well-separated clusters; stride=3 seeds centroids at ids 0, 3
    def vec(a: Double, b: Double) = Seq.tabulate(8)(i =>
      if (i < 4) a + i * 0.01 else b + i * 0.01).map(_.toFloat)
    val emb = Seq(
      (0L, vec(1.0, 0.0)), (1L, vec(1.1, 0.0)), (2L, vec(0.9, 0.0)),
      (3L, vec(0.0, 1.0)), (4L, vec(0.0, 1.1)), (5L, vec(0.0, 0.9))
    ).toDF("vec_id", "embedding")
    val edges = Similarity.knnGraph(emb, "vec_id", "embedding",
        k = 2, stride = 3)
      .collect().map(r => r.getAs[Long]("src") -> r.getAs[Long]("dst"))
    val bySrc = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(edges.length == 12)
    assert(bySrc.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    Seq(0L, 1L, 2L).foreach(s =>
      assert(bySrc(s) == Set(0L, 1L, 2L) - s, s"node $s crossed clusters"))
    Seq(3L, 4L, 5L).foreach(s =>
      assert(bySrc(s) == Set(3L, 4L, 5L) - s, s"node $s crossed clusters"))
  }

  test("c98: probes=2 recovers a boundary-straddling pair probes=1 misses") {
    import graft.operators.Similarity
    // centroids at ids 0, 3 (stride 3) point along axes 0 and 1; the
    // pair (6, 7) sits on the boundary, one on each side
    def axis(a: Double, b: Double) = (Seq(a, b) ++ Seq.fill(6)(0.0)).map(_.toFloat)
    val emb = Seq(
      (0L, axis(1.0, 0.0)), (1L, axis(0.95, 0.1)), (2L, axis(0.9, 0.05)),
      (3L, axis(0.0, 1.0)), (4L, axis(0.1, 0.95)), (5L, axis(0.05, 0.9)),
      (7L, axis(0.72, 0.70)), (8L, axis(0.70, 0.72)) // ids ∤ 3: never centroids
    ).toDF("vec_id", "embedding")
    def pairEdges(probes: Int) =
      Similarity.knnGraph(emb, "vec_id", "embedding", k = 3, stride = 3,
          probes = probes)
        .filter((col("src") === 7 && col("dst") === 8) ||
          (col("src") === 8 && col("dst") === 7))
        .count()
    assert(pairEdges(1) == 0, "probe-1 should miss the straddling pair")
    assert(pairEdges(2) == 2, "probe-2 must see it from both sides")
  }

  test("c102: knnGraphSweep per-dial edges == independent knnGraph calls") {
    import graft.operators.Similarity
    // same boundary-straddling fixture as the c98 test: the dials
    // genuinely differ (probes=2 adds the (7,8) pair), so equality is
    // non-vacuous for both the shared-prefix slice and the full list
    def axis(a: Double, b: Double) = (Seq(a, b) ++ Seq.fill(6)(0.0)).map(_.toFloat)
    val emb = Seq(
      (0L, axis(1.0, 0.0)), (1L, axis(0.95, 0.1)), (2L, axis(0.9, 0.05)),
      (3L, axis(0.0, 1.0)), (4L, axis(0.1, 0.95)), (5L, axis(0.05, 0.9)),
      (7L, axis(0.72, 0.70)), (8L, axis(0.70, 0.72))
    ).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"),
        r.getAs[Long]("cell"), r.getAs[Double]("cosine_sim"),
        r.getAs[Int]("rank"))).toSet
    val (sweep, a) = Similarity.knnGraphSweep(emb, "vec_id", "embedding",
      k = 3, probesList = Seq(1, 2), stride = 3)
    try Seq(1, 2).foreach { p =>
      val solo = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3,
        stride = 3, probes = p)
      assert(rows(sweep(p)) == rows(solo), s"probes=$p diverged")
    } finally a.unpersist()
  }

  test("top_n_by_score: bounded state equals the rank-window top-n under any partitioning") {
    import graft.functions.Fns
    val rows = (0 until 400).map(i =>
      ((i % 5).toLong, (i * 7919 % 997) / 100.0, i.toLong))
    val df = rows.toDF("g", "s", "k")
    val want = rows.groupBy(_._1).view.mapValues(
      _.sortBy { case (_, s, k) => (-s, k) }.take(3)
        .map { case (_, s, k) => (s, k) }).toMap
    for (parts <- Seq(1, 7)) {
      val got = df.repartition(parts).groupBy(col("g"))
        .agg(Fns.topNByScore(col("s"), col("k"), 3).as("t"))
        .collect().map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1)
            .map(x => (x.getDouble(0), x.getLong(1))).toList).toMap
      assert(got == want, s"mismatch at $parts partitions")
    }
  }

  test("c99: planted German tails surface as minority segments on planted docs only") {
    val rows = SparkEntry.queries("c99_line_lang")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nSeg, nKnown, minppm) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(4))
      assert(nKnown >= 1 && nKnown <= nSeg, s"doc $id: known > total")
      assert(minppm >= 0 && minppm < 1000000, s"doc $id: bad minority share")
    }
    // at least one planted doc shows the mixing signal
    assert(rows.exists(r => r.getLong(0) % 7 == 0 &&
      (r.getLong(4) > 0 || r.getString(3) == "de")),
      "no planted doc shows German segments")
  }

  test("c101: kappa sits strictly between chance and perfect agreement") {
    val r = SparkEntry.queries("c101_kappa")(spark, sf).collect().head
    val (n, agree, agreePpm, chancePpm, kappaPpm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(agree < n, "the unplanted 10% must disagree somewhere")
    assert(agree > n / 2, "planted tails must dominate agreement")
    assert(chancePpm > 0 && chancePpm < agreePpm,
      "agreement must beat chance on this construction")
    // kappa < raw agreement (chance discount) but still strong
    assert(kappaPpm < agreePpm && kappaPpm > 500000)
  }

  test("c102: recall is monotone in probes and complete at 2 on the planted corpus") {
    val rows = SparkEntry.queries("c102_knn_recall")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(rows.keySet == Set(1, 2))
    assert(rows(1) <= rows(2), "more probes can only add edges")
    assert(rows(2) == 1000000L,
      "probe-2 must recover every planted pair on this construction")
  }

  test("c103: merge coverage is strictly monotone and cumulative-consistent") {
    val rows = SparkEntry.queries("c103_merge_sweep")(spark, sf).collect()
    assert(rows.length == 4)
    val cov = rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    cov.sliding(2).foreach { case Array((_, c1, _, types), (v2, c2, _, _)) =>
      // more merges can only add coverage; strictly if types remain
      if (types > v2) assert(c2 > c1) else assert(c2 >= c1)
    }
    cov.foreach { case (v, covered, total, types) =>
      assert(covered <= total)
      if (v >= types) assert(covered == total,
        "a merge table >= the pair vocabulary must cover everything")
    }
  }

  test("c100: diff counts equal the closed-form planting") {
    val rows = SparkEntry.queries("c100_release_diff")(spark, sf).collect()
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    def total(i: Int) = rows.map(_.getLong(i)).sum
    assert(total(1) == ids.count(_ % 11 == 0), "added")
    assert(total(2) == ids.count(_ % 31 == 0), "removed")
    assert(total(3) == ids.count(i => i % 13 == 0 && i % 11 != 0), "changed")
    assert(total(4) == ids.count(i => i % 11 != 0 && i % 13 != 0), "same")
  }

  test("c95: a token-prefix fragment has containment 1.0, jaccard ~ its ratio") {
    val toks = (0 until 20).map(i => s"t$i")
    val corpus = Seq(
      (1L, toks),                 // 20 tokens → 16 distinct 5-shingles
      (2L, toks.take(12))         // prefix fragment → 8 shingles, all ⊂ doc 1
    ).toDF("doc_id", "tk")
    val got = TrainingQueries8.containmentPairs(corpus, 900000L).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) == (2L, 1L),
      "fragment must be the contained side")
    assert(r.getLong(2) == 1000000L, "strict subset → containment exactly 1")
    assert(r.getLong(3) == 500000L, "8/(16+8-8) = 0.5 jaccard")
    // and symmetric-jaccard dedup at 0.6 would have missed the pair
    assert(r.getLong(3) < 600000L)
  }
}
