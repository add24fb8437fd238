package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 1
    (4L, "completely different content about spark query engines and columnar formats here"),
    (5L, "THE  Quick   Brown fox jumps over the lazy dog near the river bank today") // dup modulo case/ws
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized text, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length == 3) // {1,2,5}, {3}, {4}
    val big = out.find(_.getAs[Long]("n_docs") == 3).get
    assert(big.getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH finds the near-dup pair and skips unrelated docs") {
    val pairs = Dedup.minHashLsh(docs.filter(col("doc_id").isin(1L, 3L, 4L)),
        "doc_id", "text", n = 3, k = 8, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard computes the exact overlap ratio") {
    val two = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    // 3-grams: {abc,bcd,cde} vs {abc,bcd,cdf}: inter=2, union=4 -> 0.5
    val out = Dedup.ngramJaccardPairs(two, "doc_id", "text", 3, 0.4).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("jaccard") == 0.5)
  }

  test("simhash: identical texts distance 0; near-dups small distance") {
    val fp = Dedup.simHash64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L)) // identical tokens -> identical fingerprint
    val d13 = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    val d14 = java.lang.Long.bitCount(fp(1L) ^ fp(4L))
    assert(d13 < d14) // one-token edit closer than unrelated doc
  }

  test("simhash pair join returns each pair once with its distance") {
    val pairs = Dedup.simHashPairs(docs.filter(col("doc_id").isin(1L, 2L, 4L)),
      "doc_id", "text", maxHamming = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(pairs(0).getAs[Int]("hamming") == 0)
  }

  test("dropExactDups keeps the min-id row of each duplicate group") {
    val out = Dedup.dropExactDups(docs, "doc_id", "text")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 3L, 4L)) // 2 and 5 are dups of 1
  }

  test("dropNearDups removes the larger id of every verified pair") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
      n = 3, k = 8, bands = 4, threshold = 0.5)
    val kept = Dedup.dropNearDups(docs, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && kept.contains(4L))
    assert(!kept.contains(2L)) // exact dup of 1 -> jaccard 1.0 -> dropped
  }

  test("embedding near-dups: scaled copy has cosine 1.0") {
    val vecs = Seq(
      (1L, Array(1.0, 2.0, 3.0)),
      (2L, Array(2.0, 4.0, 6.0)),   // same direction
      (3L, Array(-3.0, 1.0, 0.5))
    ).toDF("vec_id", "v")
    val out = Dedup.embeddingNearDups(vecs, "vec_id", "v", threshold = 0.99)
      .collect()
    assert(out.length == 1)
    assert((out(0).getLong(0), out(0).getLong(1)) == (1L, 2L))
    assert(out(0).getAs[Double]("cosine_sim") == 1.0)
  }

  test("lineDupStats: exact copies share every line; unique docs share none") {
    // 14-token docs -> 2 lines of 10/4 tokens at lineTokens=10
    val out = Dedup.lineDupStats(docs, "doc_id", "text", lineTokens = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_dup_lines"))).toMap
    assert(out(1L) == (2L, 2L)) // every line of 1 also in 2 and 5 (tokens lowercase)
    assert(out(2L) == (2L, 2L))
    assert(out(4L)._2 == 0L) // unique content: no line appears elsewhere
    // near-dup 3 shares its first line with 1/2 but not its edited tail
    assert(out(3L) == (2L, 1L))
  }

  test("substringDupStats: sliding windows catch a shared span at every alignment") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      // docs 1 and 2 share a 12-token span embedded at DIFFERENT
      // offsets — line-tiling misses misaligned copies, sliding must
      // flag all 3 windows of the span (12 - 10 + 1) in both docs
      (1L, "a b c d e f g h i j k l m n"),          // span at offset 0, 14 toks
      (2L, "x y a b c d e f g h i j k l z"),        // same span at offset 2, 15 toks
      (3L, "p q r s t u v w p2 q2 r2 s2"),          // unique, 12 toks
      (4L, "short doc")                             // < 10 tokens: no windows
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupStats(corpus, "doc_id", "text", windowTokens = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows")))).toMap
    assert(out(1L) === ((5L, 3L))) // windows at 0,1,2 lie inside a..l
    assert(out(2L) === ((6L, 3L))) // windows at 2,3,4 (0-indexed) match
    assert(out(3L) === ((3L, 0L)))
    assert(!out.contains(4L)) // no window, no row
  }

  test("connected components: chain, triangle, isolated pair, min-id labels") {
    // chain 5-6-7-8 (min 5), triangle 1-2-3 (min 1), pair 10-11 (min 10)
    val pairs = Seq(
      (6L, 5L), (6L, 7L), (8L, 7L),
      (1L, 2L), (2L, 3L), (1L, 3L),
      (11L, 10L)).toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs, "id1", "id2")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L,
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connected components: long path converges (propagation rounds)") {
    // path 1-2-3-...-12: min label must travel 11 hops; localThreshold=0
    // forces the DISTRIBUTED propagation path (the small-side union-find
    // would otherwise take it)
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs, "id1", "id2", localThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got === (1L to 12L).map(_ -> 1L).toMap)
  }

  test("connected components refuses to emit partial components") {
    // path needs 5 propagation rounds; maxIter=2 must throw, not
    // silently return wrong clusters
    val pairs = (1L until 7L).map(i => (i, i + 1)).toDF("id1", "id2")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, "id1", "id2",
        maxIter = 2, localThreshold = 0L).collect()
    }
  }

  test("connected components: local union-find equals distributed propagation") {
    val rnd = new scala.util.Random(11)
    val pairs = (1 to 60).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("id1", "id2")
    val local = Dedup.connectedComponents(pairs, "id1", "id2")
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.connectedComponents(pairs, "id1", "id2", localThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local === dist)
  }

  test("lineScrub: corpus-repeated lines drop, text rebuilds in order") {
    val docs = Seq(
      (1L, "boil boil boil boil boil u1 u2 u3 u4 u5"),
      (2L, "boil boil boil boil boil v1 v2 v3 v4 v5"),
      (3L, "w1 w2 w3 w4 w5"),
      (4L, "boil boil boil boil boil"),                    // all boilerplate
      (5L, "x1 x2 x3 x4 x5 boil boil boil boil boil y1 y2 y3") // middle line drops
    ).toDF("doc_id", "text")
    val got = Dedup.lineScrub(docs, "doc_id", "text", lineTokens = 5, maxOcc = 1)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_lines_kept"),
          r.getAs[String]("scrubbed_text"))))
      .toMap
    assert(got === Map(
      1L -> ((2L, 1L, "u1 u2 u3 u4 u5")),
      2L -> ((2L, 1L, "v1 v2 v3 v4 v5")),
      3L -> ((1L, 1L, "w1 w2 w3 w4 w5")),
      4L -> ((1L, 0L, "")),
      5L -> ((3L, 2L, "x1 x2 x3 x4 x5 y1 y2 y3"))))
  }

  test("substringScrub: tokens under any repeated window are cut, misaligned") {
    // docs 1 and 2 share the 3-token span "a b c" at DIFFERENT offsets
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x a b c y"),
      (3L, "p q r"),                 // unique window: untouched
      (4L, "m n o m n o m n"),      // self-repeating: fully excised
      (5L, "s t")                   // shorter than a window: untouched
    ).toDF("doc_id", "text")
    val got = Dedup.substringScrub(docs, "doc_id", "text", windowTokens = 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_tokens_kept"),
          r.getAs[String]("scrubbed_text"))))
      .toMap
    assert(got === Map(
      1L -> ((5L, 2L, "d e")),      // pos 0-2 covered by "a b c"
      2L -> ((5L, 2L, "x y")),      // pos 1-3 covered by the same span
      3L -> ((3L, 3L, "p q r")),
      4L -> ((8L, 0L, "")),         // every window repeats in-doc
      5L -> ((2L, 2L, "s t"))))
  }

  test("lineScrub: maxOcc raises the boilerplate bar") {
    // the shared line occurs twice: maxOcc=2 keeps it everywhere
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e")
    ).toDF("doc_id", "text")
    val keep2 = Dedup.lineScrub(docs, "doc_id", "text", lineTokens = 5, maxOcc = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_lines_kept"))
      .toMap
    assert(keep2 === Map(1L -> 1L, 2L -> 1L))
  }

  test("crossCorpusFlags: flags new-vs-ref dups only — within-batch pairs are out of scope") {
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different content about spark query engines and columnar formats here")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      // near-dup of ref doc 1 → must flag
      (10L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      // identical twins WITHIN the batch, novel vs ref → must both pass
      // (the operator's contract: within-batch dedup is c1/c2's job)
      (11L, "totally novel sentences describing embedding sketches and banded joins at scale"),
      (12L, "totally novel sentences describing embedding sketches and banded joins at scale")
    ).toDF("doc_id", "text")
    val flags = Dedup.crossCorpusFlags(fresh, ref, "doc_id", "text",
        n = 3, k = 8, bands = 4, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("is_dup")).toMap
    assert(flags === Map(10L -> 1L, 11L -> 0L, 12L -> 0L))
  }

  test("winnowing guarantee: a shared run of >= w+k-1 tokens yields a shared fingerprint") {
    // k=3, w=2: any shared run of >= 4 tokens must produce at least
    // one common selected fingerprint (the Schleimer et al. bound)
    val two = Seq(
      (1L, "p q r s t u v w"),
      (2L, "x y r s t u z"),   // shares the 4-token run "r s t u" with 1
      (3L, "a b c d e f g")    // no 3-gram shared with anyone
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(two, "doc_id", "text", k = 3, w = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val byDoc = fps.groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "guaranteed shared fingerprint missing")
    assert((byDoc(1L) & byDoc(3L)).isEmpty && (byDoc(2L) & byDoc(3L)).isEmpty)
    // density: winnowing selects a strict subset once hs is longer than w
    assert(byDoc(1L).size < 6) // 6 k-grams in doc 1
  }

  test("crossCorpusFlags edges: empty reference passes everything; empty batch is empty") {
    val some = Seq((1L, "a perfectly ordinary sentence with enough words to shingle"))
      .toDF("doc_id", "text")
    val none = some.filter(col("doc_id") < 0)
    val vsEmptyRef = Dedup.crossCorpusFlags(some, none, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("is_dup")).toMap
    assert(vsEmptyRef === Map(1L -> 0L))
    assert(Dedup.crossCorpusFlags(none, some, "doc_id", "text", n = 3).count() == 0)
  }
}
