package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunker, PiiScrub, TfIdf, VectorStats}

/** Unit coverage for the round-2 corpus operators (TF-IDF, chunking,
  * PII scrub, centroid sums) on hand-built edge cases the synthetic
  * corpus doesn't exercise. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf ranks rare terms above common ones") {
    val docs = Seq(
      (1L, "alpha common common"),
      (2L, "beta common"),
      (3L, "gamma common")).toDF("doc_id", "text")
    val top1 = TfIdf.topTerms(docs, "doc_id", "text", k = 1)
      .select("doc_id", "word").as[(Long, String)].collect().toMap
    // each doc's unique term (df=1) outranks 'common' (df=3) even
    // where 'common' has higher tf
    assert(top1 === Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
  }

  test("vocabulary counts totals and doc frequency") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val v = TfIdf.vocabulary(docs, "doc_id", "text")
      .select("word", "n_total", "n_docs").as[(String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(v === Map("a" -> ((2L, 1L)), "b" -> ((2L, 2L)), "c" -> ((1L, 1L))))
  }

  test("chunker covers every token; overlap matches stride") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Chunker.chunkTokens(docs, "doc_id", "text", size = 64, stride = 32)
      .orderBy("chunk_id")
      .select(col("chunk_id"), col("chunk_tokens"))
      .as[(Long, Seq[String])].collect()
    // starts at 0, 32, 64, 96 -> lengths 64, 64, 36, 4
    assert(chunks.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(chunks.map(_._2.size).toSeq === Seq(64, 64, 36, 4))
    assert(chunks(0)._2.head === "t1" && chunks(1)._2.head === "t33")
    assert(chunks(3)._2 === Seq("t97", "t98", "t99", "t100"))
  }

  test("chunker emits nothing for empty or null text") {
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "one"))
      .toDF("doc_id", "text")
    val got = Chunker.chunkTokens(docs, "doc_id", "text", 4, 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(3L))
  }

  test("pii scrub replaces emails/cards/ips/phones in chain order") {
    val docs = Seq(
      (1L, "mail a@b.com and c.d+e@f-g.org or call 555-0199"),
      (2L, "clean text no pii"),
      (3L, "dial (555) 012-3456 now"),
      (4L, "card 4111-1111-1111-1234 from 192.168.0.1")).toDF("doc_id", "text")
    val got = PiiScrub.scrub(docs, "doc_id", "text")
      .select("doc_id", "n_emails", "n_cards", "n_ips", "n_phones", "scrubbed")
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got(1L) === ((2L, 0L, 0L, 1L, "mail <EMAIL> and <EMAIL> or call <PHONE>")))
    assert(got(2L) === ((0L, 0L, 0L, 0L, "clean text no pii")))
    assert(got(3L) === ((0L, 0L, 0L, 1L, "dial <PHONE> now")))
    // the card is redacted BEFORE the phone pattern could bite its
    // digit groups; the IP survives to its own stage
    assert(got(4L) === ((0L, 1L, 1L, 0L, "card <CARD> from <IP>")))
  }

  test("hash split is exhaustive, deterministic, and near the fractions") {
    val docs = (1L to 2000L).toDF("doc_id")
    val splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val counts = graft.operators.Splitter.hashSplit(docs, "doc_id", splits)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === 2000L)
    assert(counts("train") > 1500 && counts("train") < 1700) // ~1600
    assert(counts("valid") > 120 && counts("valid") < 280)
    // determinism: same assignment on a re-run
    val again = graft.operators.Splitter.hashSplit(docs, "doc_id", splits)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again === counts)
  }

  test("stratified sample is per-stratum independent") {
    val df = Seq(("en", 1L), ("de", 1L), ("en", 2L), ("de", 2L))
      .toDF("lang", "doc_id")
    val kept = graft.operators.Splitter
      .stratifiedSample(df, "lang", "doc_id", 0.5)
      .as[(String, Long)].collect().toSet
    // salting with the stratum means (en,1) and (de,1) decide
    // independently — the test pins that the op runs and yields a
    // subset; exact membership is hash-determined
    assert(kept.subsetOf(Set(("en", 1L), ("de", 1L), ("en", 2L), ("de", 2L))))
  }

  test("upsample replicates by floor(f) + hash-decided extra; zero copies drop") {
    val df = (1L to 400L).map(i => (if (i % 2 == 0) "de" else "en", i))
      .toDF("lang", "doc_id")
    val out = graft.operators.Splitter
      .upsample(df, "lang", "doc_id", Map("de" -> 2.5, "en" -> 0.5))
    val copies = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    // de: 200 docs × ~2.5 -> copies in [2×200, 3×200], centered 500
    assert(copies("de") >= 400L && copies("de") <= 600L)
    assert(math.abs(copies("de") - 500L) < 60, s"de far off 2.5×: $copies")
    // en: 200 docs × ~0.5 -> about 100 single copies
    assert(math.abs(copies("en") - 100L) < 40, s"en far off 0.5×: $copies")
    // copy_id enumerates 1..n_copies for every kept doc
    val bad = out.filter(col("copy_id") > col("n_copies") || col("copy_id") < 1)
    assert(bad.count() === 0L)
    // determinism
    val again = graft.operators.Splitter
      .upsample(df, "lang", "doc_id", Map("de" -> 2.5, "en" -> 0.5))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(again === copies)
  }

  test("corpus pipeline: exact dup, short doc, and near-dup copy all drop") {
    val good = (1 to 60).map(i => s"w$i").mkString(" ") // 60 tokens, clean
    val near = good + " zz"                             // near-dup of good
    val docs = Seq(
      (1L, good),
      (2L, good),            // exact dup of 1 -> dropped
      (3L, "too short"),     // fails minTokens -> dropped
      (4L, near),            // near-dup of 1 -> clustered, dropped
      (5L, (100 to 170).map(i => s"v$i").mkString(" ")) // distinct, kept
    ).toDF("doc_id", "text")
    val kept = graft.operators.CorpusPipeline
      .keptDocs(docs, "doc_id", "text",
        graft.operators.CorpusPipeline.Config(minTokens = 40, minQuality = 0.0))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 5L))
  }

  test("int8 quantization clips to [-127, 127] and rounds ties away from zero") {
    val df = Seq((1L, Array(2.5f, -3.0f, 0.5f, -0.5f, 0.003f)))
      .toDF("vec_id", "embedding")
    val got = df.select(
        graft.operators.VectorStats.quantizeInt8(col("embedding")).as("q"))
      .as[Seq[Int]].collect()(0)
    // 0.5 is exact in binary: ±0.5*127 = ±63.5 rounds away to ±64
    assert(got === Seq(127, -127, 64, -64, 0))
  }

  test("decontaminate flags only docs sharing an n-gram with the eval set") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j"),      // contains eval 8-gram
      (2L, "a b c d e f g x y z"),      // 7-gram prefix only -> clean
      (3L, "q r s t u v w x")).toDF("doc_id", "text")
    val eval = Seq("a b c d e f g h").toDF("text")
    val got = graft.operators.Decontaminate
      .flagged(corpus, "doc_id", "text", eval, "text", n = 8)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L))
  }

  test("decontaminate plans the eval side as a broadcast join") {
    val corpus = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val eval = Seq("a b c d e f g h").toDF("text")
    val plan = graft.operators.Decontaminate
      .flagged(corpus, "doc_id", "text", eval, "text", n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval side not broadcast:\n$plan")
  }

  test("bloom decontaminate matches the exact path and plans the prefilter") {
    // planted overlap (doc 1), a near-miss (doc 2), and bulk clean docs
    val corpus = ((1L, "a b c d e f g h i j") ::
      (2L, "a b c d e f g x y z") ::
      (3L to 60L).map(i => (i, s"doc $i filler text row ${i * 7} " * 3)).toList)
      .toDF("doc_id", "text")
    val eval = Seq("a b c d e f g h").toDF("text")
    val exact = graft.operators.Decontaminate
      .flagged(corpus, "doc_id", "text", eval, "text", n = 8)
      .as[(Long, Long)].collect().toMap
    val bloomed = graft.operators.Decontaminate
      .flaggedBloom(corpus, "doc_id", "text", eval, "text", n = 8)
    assert(bloomed.as[(Long, Long)].collect().toMap === exact)
    assert(exact === Map(1L -> 1L))
    // the Bloom membership test must sit below the exact-confirm join
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom prefilter:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"confirm join not broadcast:\n$plan")
  }

  test("centroid sums are exact micro-unit integers per (label, dim)") {
    val emb = Seq(
      ("a", Array(0.5f, -1.25f)),
      ("a", Array(0.25f, 0.75f)),
      ("b", Array(1.0f, 2.0f))).toDF("label", "embedding")
    val got = VectorStats.centroidSums(emb, "label", "embedding")
      .select("label", "dim", "sum_micro", "n_vecs")
      .as[(String, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got === Map(
      ("a", 0) -> ((750000L, 2L)), ("a", 1) -> ((-500000L, 2L)),
      ("b", 0) -> ((1000000L, 1L)), ("b", 1) -> ((2000000L, 1L))))
  }
}
