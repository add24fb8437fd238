package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("lang id picks the language with most marker hits; en wins ties") {
    val docs = Seq(
      (1L, "the cat and the dog of a house is in order"),
      (2L, "der hund und die katze ist ein tier"),
      (3L, "xyzzy qwerty plugh")
    ).toDF("doc_id", "text")
    val (pred, _) = TextAnalysis.langId(col("text"))
    val out = docs.select(col("doc_id"), pred.as("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "unknown"))
  }

  test("canonicalUrl collapses scheme/www/case/query/fragment/slash variants") {
    val urls = Seq(
      "https://Site7.com/Page3/?utm=x",
      "http://www.site7.com/page3#sec",
      "www.Site7.com/Page3/",
      "HTTPS://WWW.SITE7.COM/PAGE3").toDF("u")
    val out = urls.select(TextAnalysis.canonicalUrl(col("u")).as("c"))
      .as[String].collect().toSet
    assert(out === Set("site7.com/page3"))
    // www elsewhere in the path survives; only the leading one strips
    val keep = Seq("https://a.com/www.b").toDF("u")
      .select(TextAnalysis.canonicalUrl(col("u"))).as[String].head()
    assert(keep === "a.com/www.b")
  }

  test("token counts: whitespace vs BPE-ish regex") {
    val docs = Seq((1L, "Hello, world! v2.0 costs $15")).toDF("doc_id", "text")
    val out = docs.select(
      TextAnalysis.wsTokenCount(col("text")).as("ws"),
      TextAnalysis.bpeTokenCount(col("text")).as("bpe")).collect()(0)
    assert(out.getAs[Int]("ws") == 5)
    // Hello , world ! v 2 . 0 costs $ 1 5 -> 12
    assert(out.getAs[Int]("bpe") == 12)
  }

  test("quality metrics guard zero-length and zero-token inputs") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "plain text here")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id") +:
        TextAnalysis.qualityCols(col("text")).map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("mean_token_len") == 0.0) // no div-by-zero
    assert(out(1).getAs[Long]("n_tokens") == 0L)
    assert(out(2).getAs[Double]("quality_score") > 0.0)
  }

  test("url density counts http and www spans, flags link-farm docs") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "plain prose with no links at all in here"),
      (2L, "see http://a.io/x and https://b.io and www.c.org now"),
      (3L, "")
    ).toDF("id", "text")
    val cols = TextAnalysis.urlCols(col("text"), flagMicro = 100000L)
    val out = df.select(col("id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_urls"), r.getAs[Int]("flagged"))).toMap
    assert(out(1L) == (0L, 0))
    assert(out(2L) == (3L, 1)) // 3 urls / 9 tokens = 333333 micro >= 100000
    assert(out(3L) == (0L, 0)) // empty text: zero tokens, zero density
  }

  test("blocklist counts occurrences vs distinct terms and flags") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "clean text with nothing on the list"),
      (2L, "bad bad thing"),       // 2 hits, 1 distinct
      (3L, "bad worse and worse"), // 3 hits, 2 distinct
      (4L, "")
    ).toDF("id", "text")
    val toks = graft.functions.Fns.tokens(col("text"))
    val cols = TextAnalysis.blocklistCols(toks, Seq("bad", "worse"))
      .map { case (n, c) => c.as(n) }
    val out = df.select(col("id") +: cols: _*)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((0L, 0L, 0L)))
    assert(out(2L) === ((2L, 1L, 1L)))
    assert(out(3L) === ((3L, 2L, 1L)))
    assert(out(4L) === ((0L, 0L, 0L)))
  }

  test("fingerprints are whitespace/case-insensitive and shingle-stable") {
    val docs = Seq(
      (1L, "The Quick  Brown Fox jumps over it"),
      (2L, "the quick brown fox jumps over it")
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id") +:
        TextAnalysis.fingerprintCols(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("fp_md5") == out(2L).getAs[String]("fp_md5"))
    assert(out(1L).getAs[String]("fp_minshingle") == out(2L).getAs[String]("fp_minshingle"))
  }
}
