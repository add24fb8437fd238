package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decontaminate, Importance, Stats}

/** Unit semantics for the r5 third-batch operators: Stats (entropy /
  * welch t / time-decayed sum), Importance (DSIR), and fractional
  * decontamination — small hand-computable plants, not oracle mirrors
  * (tools/check.py covers those). */
class StatsImportanceSpec extends SparkSpec {
  import spark.implicits._

  test("entropyAgg: uniform 4-way mix is exactly 2 bits; single-category is 0") {
    val df = Seq(
      ("u", "a"), ("u", "b"), ("u", "c"), ("u", "d"),
      ("s", "x"), ("s", "x"), ("s", "x"))
      .toDF("g", "cat")
    val out = Stats.entropyAgg(df, Seq("g"), col("cat"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out("u")._1 == 4L && math.abs(out("u")._2 - 2.0) < 1e-12)
    assert(out("s")._1 == 3L && math.abs(out("s")._2) < 1e-12)
  }

  test("entropyAgg: 75/25 split matches the closed form") {
    val df = (Seq.fill(3)("h") ++ Seq("t")).map(("g", _)).toDF("g", "cat")
    val h = Stats.entropyAgg(df, Seq("g"), col("cat"))
      .collect().head.getDouble(2)
    val expect = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25)) / math.log(2)
    assert(math.abs(h - expect) < 1e-12)
  }

  test("welchT: equal cohorts give t=0; a known shift matches the closed form") {
    // cohort A = {1,2,3}, B = {1,2,3}: t = 0
    val same = Seq(("g", 0L, 1.0), ("g", 0L, 2.0), ("g", 0L, 3.0),
      ("g", 1L, 1.0), ("g", 1L, 2.0), ("g", 1L, 3.0))
      .toDF("g", "u", "v")
    val t0 = Stats.welchT(same, Seq("g"), col("v"),
      pmod(col("u"), lit(2)) === 0, pmod(col("u"), lit(2)) === 1)
      .collect().head.getAs[Double]("t")
    assert(math.abs(t0) < 1e-12)
    // A = {1,2,3}, B = {4,5,6}: var = 1 each, se² = 2/3, t = -3/√(2/3)
    val shift = Seq(("g", 0L, 1.0), ("g", 0L, 2.0), ("g", 0L, 3.0),
      ("g", 1L, 4.0), ("g", 1L, 5.0), ("g", 1L, 6.0))
      .toDF("g", "u", "v")
    val t1 = Stats.welchT(shift, Seq("g"), col("v"),
      pmod(col("u"), lit(2)) === 0, pmod(col("u"), lit(2)) === 1)
      .collect().head.getAs[Double]("t")
    assert(math.abs(t1 - (-3.0 / math.sqrt(2.0 / 3.0))) < 1e-12)
  }

  test("welchT: undersized cohort or zero variance yields null t, never NaN/Inf") {
    val tiny = Seq(("g", 0L, 1.0), ("g", 1L, 2.0), ("g", 1L, 3.0))
      .toDF("g", "u", "v") // n_a = 1
    val r1 = Stats.welchT(tiny, Seq("g"), col("v"),
      pmod(col("u"), lit(2)) === 0, pmod(col("u"), lit(2)) === 1)
      .collect().head
    assert(r1.isNullAt(r1.fieldIndex("t")))
    val flat = Seq(("g", 0L, 5.0), ("g", 0L, 5.0),
      ("g", 1L, 5.0), ("g", 1L, 5.0)).toDF("g", "u", "v")
    val r2 = Stats.welchT(flat, Seq("g"), col("v"),
      pmod(col("u"), lit(2)) === 0, pmod(col("u"), lit(2)) === 1)
      .collect().head
    assert(r2.isNullAt(r2.fieldIndex("t")))
  }

  test("decayedSumAtLast: closed form over a 3-event series; τ-invariance at the last point") {
    val day = 86400L * 1000000000L
    val df = Seq((7L, 0L * day, 2.0), (7L, 1L * day, 3.0), (7L, 2L * day, 5.0))
      .toDF("u", "tns", "v")
    val r = Stats.decayedSumAtLast(df, Seq("u"), col("tns"), col("v"), day)
      .collect().head
    val expect = 2.0 * math.exp(-2.0) + 3.0 * math.exp(-1.0) + 5.0
    assert(r.getAs[Long]("n_events") == 3L)
    assert(r.getAs[Long]("last_ts_s") == 2L * 86400L)
    assert(math.abs(r.getAs[Double]("decayed_sum") - expect) < 1e-12)
    // a single event always scores exactly its value, whatever τ
    val one = Seq((1L, 12345L, 9.5)).toDF("u", "tns", "v")
    val rv = Stats.decayedSumAtLast(one, Seq("u"), col("tns"), col("v"), day)
      .collect().head.getAs[Double]("decayed_sum")
    assert(rv == 9.5)
  }

  test("ks2Sample: hand-computed D on overlapping cohorts; identical cohorts give 0") {
    // A = {1,2}, B = {2,3}: ECDF gaps (×nA·nB=4) are 2,2,0 → D = 2/4
    val df = Seq(("g", 0L, 1.0), ("g", 0L, 2.0), ("g", 1L, 2.0), ("g", 1L, 3.0))
      .toDF("g", "u", "v")
    val r = operators.Stats.ks2Sample(df, Seq("g"), col("v"),
      pmod(col("u"), lit(2)) === 0).collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("d_num") == 2L)
    assert(r.getAs[Double]("ks_d") == 0.5)
    // identical samples → D = 0 exactly
    val same = Seq(("g", 0L, 1.0), ("g", 0L, 5.0), ("g", 1L, 1.0), ("g", 1L, 5.0))
      .toDF("g", "u", "v")
    val r2 = operators.Stats.ks2Sample(same, Seq("g"), col("v"),
      pmod(col("u"), lit(2)) === 0).collect().head
    assert(r2.getAs[Long]("d_num") == 0L && r2.getAs[Double]("ks_d") == 0.0)
  }

  test("ks2Sample: an empty cohort yields null D, never NaN") {
    val df = Seq(("g", 0L, 1.0), ("g", 0L, 2.0)).toDF("g", "u", "v")
    val r = operators.Stats.ks2Sample(df, Seq("g"), col("v"),
      pmod(col("u"), lit(2)) === 0).collect().head
    assert(r.getAs[Long]("n_b") == 0L)
    assert(r.isNullAt(r.fieldIndex("ks_d")))
  }

  test("ks2Sample: disjoint supports reach D = 1") {
    val df = Seq(("g", 0L, 1.0), ("g", 0L, 2.0), ("g", 1L, 9.0), ("g", 1L, 10.0))
      .toDF("g", "u", "v")
    val r = operators.Stats.ks2Sample(df, Seq("g"), col("v"),
      pmod(col("u"), lit(2)) === 0).collect().head
    assert(r.getAs[Double]("ks_d") == 1.0)
  }

  test("mannWhitney: exact U with tied values (half-unit ranks); separated cohorts hit U=0") {
    // A = {1,2}, B = {2,3}: ranks 1, 2.5, 2.5, 4 → R1 = 3.5, U1 = 0.5
    val tied = Seq(("g", 0L, 1.0), ("g", 0L, 2.0), ("g", 1L, 2.0), ("g", 1L, 3.0))
      .toDF("g", "u", "v")
    val r = operators.Stats.mannWhitney(tied, Seq("g"), col("v"),
      pmod(col("u"), lit(2)) === 0).collect().head
    assert(r.getAs[Double]("u1") == 0.5)
    assert(r.getAs[Double]("z") < 0) // A stochastically smaller
    // fully separated: U1 = 0; and U1 + U2 = nA·nB means the flipped
    // cohort indicator must give U1' = nA·nB
    val sep = Seq(("g", 0L, 1.0), ("g", 0L, 2.0), ("g", 1L, 3.0), ("g", 1L, 4.0))
      .toDF("g", "u", "v")
    val lo = operators.Stats.mannWhitney(sep, Seq("g"), col("v"),
      pmod(col("u"), lit(2)) === 0).collect().head
    val hi = operators.Stats.mannWhitney(sep, Seq("g"), col("v"),
      pmod(col("u"), lit(2)) === 1).collect().head
    assert(lo.getAs[Double]("u1") == 0.0)
    assert(hi.getAs[Double]("u1") == 4.0)
  }

  test("mannWhitney: all-tied values give zero variance and a null z, never NaN") {
    val flat = Seq(("g", 0L, 5.0), ("g", 0L, 5.0), ("g", 1L, 5.0), ("g", 1L, 5.0))
      .toDF("g", "u", "v")
    val r = operators.Stats.mannWhitney(flat, Seq("g"), col("v"),
      pmod(col("u"), lit(2)) === 0).collect().head
    assert(r.getAs[Double]("u1") == 2.0) // all share rank 2.5 → R1 = 5
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("ks2Sample/mannWhitney agree with plain-Scala references on random cohorts") {
    // deterministic pseudo-random plants (no Gen dependency needed):
    // value ∈ {0..9} forces heavy ties — the hard case for both
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val rows = (0 until 60).map { i =>
        ("g", rnd.nextInt(2).toLong, rnd.nextInt(10).toDouble) }
      val df = rows.toDF("g", "u", "v")
      val a = rows.filter(_._2 == 0).map(_._3).sorted
      val b = rows.filter(_._2 == 1).map(_._3).sorted
      // reference KS over the pooled support
      val refD = (a ++ b).distinct.map { x =>
        math.abs(a.count(_ <= x).toDouble / a.size -
          b.count(_ <= x).toDouble / b.size) }.max
      val ks = operators.Stats.ks2Sample(df, Seq("g"), col("v"),
        pmod(col("u"), lit(2)) === 0).collect().head
      assert(math.abs(ks.getAs[Double]("ks_d") - refD) < 1e-12,
        s"trial $trial KS mismatch")
      // reference U₁ via average ranks over the pooled sample
      val pooled = (a.map((_, 0)) ++ b.map((_, 1))).sortBy(_._1)
      val rankOf = pooled.map(_._1).distinct.map { x =>
        val lo = pooled.count(_._1 < x); val c = pooled.count(_._1 == x)
        x -> (lo + (c + 1) / 2.0) }.toMap
      val r1 = a.map(rankOf).sum
      val refU1 = r1 - a.size * (a.size + 1) / 2.0
      val mw = operators.Stats.mannWhitney(df, Seq("g"), col("v"),
        pmod(col("u"), lit(2)) === 0).collect().head
      assert(mw.getAs[Double]("u1") == refU1, s"trial $trial U mismatch")
    }
  }

  test("charTrigrams: whitespace-normalized windows; under 3 chars is empty, never a descending sequence") {
    val df = Seq((1L, "abc  d"), (2L, "ab"), (3L, "")).toDF("id", "text")
    val out = df.select(col("id"),
        Importance.charTrigrams(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("abc", "bc ", "c d")) // "abc  d" normalizes to "abc d"
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("trigramPerplexity: a one-trigram corpus has H=0, ppl=1; uniform novel text scores worse than repeated text") {
    val mono = Seq((1L, "aaaa")).toDF("doc_id", "text") // trigrams: aaa ×2
    val r = Importance.trigramPerplexity(mono, "doc_id", "text")
      .collect().head
    assert(r.getAs[Long]("n_trigrams") == 2L)
    assert(math.abs(r.getAs[Double]("h")) < 1e-12)
    assert(math.abs(r.getAs[Double]("ppl") - 1.0) < 1e-12)
    // doc of corpus-frequent trigrams beats a doc of one-off trigrams
    val corpus = Seq((1L, "ababababab"), (2L, "qrstuvwxyz")).toDF("doc_id", "text")
    val out = Importance.trigramPerplexity(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("ppl")).toMap
    assert(out(1L) < out(2L))
  }

  test("dsirScores: target-heavy words score positive, raw-only words negative") {
    val docs = Seq(
      (1L, "aa aa bb", true), (2L, "aa cc", true),
      (3L, "zz zz yy", false), (4L, "zz yy", false))
      .toDF("doc_id", "text", "tgt")
    val out = Importance.dsirScores(docs, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    // target docs contain only target-corpus words → positive ratio;
    // raw-only docs' words never appear in target → negative
    assert(out(1L) > 0 && out(2L) > 0)
    assert(out(3L) < 0 && out(4L) < 0)
    // within each side, heavier target mass ranks higher
    assert(out(1L) > out(3L))
  }

  test("dsirScores: empty-text docs are absent; token counts are per-doc") {
    val docs = Seq((1L, "a b c", true), (2L, "", false))
      .toDF("doc_id", "text", "tgt")
    val rows = Importance.dsirScores(docs, "doc_id", "text", col("tgt"))
      .collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L))
    assert(rows.head.getAs[Long]("n_toks") == 3L)
  }

  test("overlapFraction: planted overlap gives the exact ratio; clean docs report 0") {
    // doc 1: 9 tokens → 2 distinct 8-grams; eval holds the first one
    val corpus = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8"),
      (3L, "short doc")).toDF("doc_id", "text")
    val eval = Seq("t1 t2 t3 t4 t5 t6 t7 t8").toDF("text")
    val out = Decontaminate.overlapFraction(corpus, "doc_id", "text",
        eval, "text", n = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hits"),
          r.getAs[Double]("frac"))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((1L, 0L, 0.0)))
    assert(!out.contains(3L)) // < n tokens → no shingles → absent
  }

  test("overlapFraction: repeated n-grams inside a doc count once (distinct shingles)") {
    val corpus = Seq((1L, "a b c d e f g h a b c d e f g h"))
      .toDF("doc_id", "text") // the 8-gram "a..h" occurs twice
    val eval = Seq("a b c d e f g h").toDF("text")
    val r = Decontaminate.overlapFraction(corpus, "doc_id", "text",
      eval, "text", n = 8).collect().head
    // 9 windows of the 16-token doc, first ≡ last → 8 distinct; the
    // duplicated window hits once
    assert(r.getAs[Long]("n_shingles") == 8L)
    assert(r.getAs[Long]("n_hits") == 1L)
  }
}
