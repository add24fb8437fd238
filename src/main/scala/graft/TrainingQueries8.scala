package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.operators.TfIdf
import graft.sources.Tables

/** C-series round 7: retrieval scoring and tokenizer-training
  * statistics (SURVEY §2C — reference scope addition; the reference
  * pipes events into ClickHouse, a training-data pipeline additionally
  * ranks and tokenizes what it ingested).
  *
  * Cross-engine rules as everywhere: md5-only hashing, and scores in
  * integer rationals — BM25's ln() would be libm-dependent, so c90
  * uses the log-free Robertson-odds idf (monotone per-term in the
  * textbook idf) with k1 = 6/5, b = 3/4 as exact integer fractions.
  */
object TrainingQueries8 {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** C90: BM25 document retrieval, log-free integer form. The query is
    * data-derived (vocabulary ranks 10-12 — past the stopword head,
    * still frequent enough to hit many docs), so the whole thing is
    * one deterministic corpus computation both engines can mirror.
    *
    * Scale shape: ONE corpus scan builds tf; doc lengths and totals
    * are rollups OVER tf (never a second scan); the query-term
    * restriction happens BEFORE doc-frequency counting, so df/score
    * work touches only rows containing query terms. score_micro =
    * idf_milli * 44·tf·T div (20·tf·T + 6·T + 18·len·N) with
    * T = corpus tokens, N = docs — exact int64 to ~1e7 docs; swap the
    * product chain to decimal(38,0) beyond. */
  private def c90Bm25(s: SparkSession, dir: String): DataFrame =
    bm25TopDocs(T(s, dir, "documents"), "doc_id", "text",
      vocabRankLo = 10, vocabRankHi = 12, k = 20)

  /** Log-free BM25: Robertson-odds idf (N−df+1)·1000 div (df+1) in
    * place of its log — per-term monotone to textbook BM25 idf — and
    * the exact length normalization tf·(k1+1)/(tf + k1·(1−b+b·len/avgdl))
    * as one integer fraction (k1 = 6/5, b = 3/4, avgdl = T/N):
    * 44·tf·T / (20·tf·T + 6·T + 18·len·N).
    *
    * tf PERSISTS: four rollups fork off it (query vocab, doc lengths,
    * corpus totals, the query-restricted scores) and without the cache
    * each fork re-scans and re-explodes the whole corpus (the b96
    * lesson — plan-guarded). The cache holds (doc, term, freq)
    * aggregates, not text: orders of magnitude below corpus size. */
  private def bm25TopDocs(docs: DataFrame, idCol: String, textCol: String,
                          vocabRankLo: Int, vocabRankHi: Int, k: Int): DataFrame = {
    val tf = TfIdf.termFreq(docs, idCol, textCol).persist()
    val query = tf.groupBy("word").agg(sum("term_freq").as("n_total"))
      .withColumn("vrk",
        row_number().over(Window.orderBy(col("n_total").desc, col("word"))))
      .filter(col("vrk").between(vocabRankLo, vocabRankHi)).select("word")
    val lens = tf.groupBy(col(idCol)).agg(sum("term_freq").as("doc_len"))
    val totals = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(tf.agg(sum("term_freq").as("total_toks")))
    val qtf = tf.join(broadcast(query), "word")
    val qdf = qtf.groupBy("word").agg(count(lit(1)).as("doc_freq"))
    qtf.join(broadcast(qdf), "word")
      .join(lens, idCol)
      .crossJoin(broadcast(totals))
      .withColumn("score_micro", expr(
        """((n_docs - doc_freq + 1) * 1000 div (doc_freq + 1))
           * (44 * term_freq * total_toks)
           div (20 * term_freq * total_toks + 6 * total_toks
                + 18 * doc_len * n_docs)"""))
      .groupBy(col(idCol))
      .agg(sum("score_micro").as("score_micro"),
        count(lit(1)).as("n_terms_hit"))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("score_micro").desc, col(idCol))))
      .filter(col("rk") <= k)
      .select(col("rk"), col(idCol), col("score_micro"), col("n_terms_hit"))
      .orderBy(col("rk"))
  }

  /** C92: the distributed half of BPE training — adjacent-pair counts
    * over the corpus (each merge round of byte-pair encoding picks the
    * most frequent adjacent pair; this is that argmax's input,
    * top-20). Pairs come from an in-row generator (zip the token array
    * against its own tail) — one corpus scan, no position self-join —
    * so the shuffle moves (pair, count) partials, never positions. */
  private def c92BpePairs(s: SparkSession, dir: String): DataFrame = {
    val tk = T(s, dir, "documents")
      .select(Fns.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
    val pairs = tk.select(explode(transform(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        (x: Column, i: Column) => struct(x.as("w1"),
          element_at(col("tk"), i + 2).as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
    pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n_pairs"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n_pairs").desc, col("w1"), col("w2"))))
      .filter(col("rk") <= 20)
      .withColumn("merged", concat(col("w1"), lit("_"), col("w2")))
      .select("rk", "w1", "w2", "n_pairs", "merged")
      .orderBy("rk")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c90_bm25" -> (c90Bm25 _),
    "c92_bpe_pairs" -> (c92BpePairs _)
  )

  private val toksSql = """regexp_extract_all(lower(trim(text)), '\S+')"""

  def oracleSql: Map[String, String] = Map(
    "c90_bm25" ->
      s"""WITH toks AS (
            SELECT doc_id, unnest($toksSql) AS word FROM documents),
          tf AS (
            SELECT doc_id, word, count(*) AS term_freq
            FROM toks GROUP BY doc_id, word),
          vocab AS (
            SELECT word, CAST(sum(term_freq) AS BIGINT) AS n_total
            FROM tf GROUP BY word),
          vr AS (
            SELECT word, row_number() OVER (ORDER BY n_total DESC, word)
              AS vrk FROM vocab),
          q AS (SELECT word FROM vr WHERE vrk BETWEEN 10 AND 12),
          lens AS (
            SELECT doc_id, CAST(sum(term_freq) AS BIGINT) AS doc_len
            FROM tf GROUP BY doc_id),
          n AS (SELECT count(*) AS n_docs FROM documents),
          tot AS (SELECT CAST(sum(term_freq) AS BIGINT) AS total_toks FROM tf),
          qtf AS (SELECT tf.* FROM tf JOIN q USING (word)),
          qdf AS (SELECT word, count(*) AS doc_freq FROM qtf GROUP BY word),
          scored AS (
            SELECT qtf.doc_id,
              ((n.n_docs - qdf.doc_freq + 1) * 1000 // (qdf.doc_freq + 1))
                * (44 * qtf.term_freq * tot.total_toks)
                // (20 * qtf.term_freq * tot.total_toks + 6 * tot.total_toks
                   + 18 * lens.doc_len * n.n_docs) AS score_micro
            FROM qtf JOIN qdf USING (word) JOIN lens USING (doc_id)
            CROSS JOIN n CROSS JOIN tot),
          agg AS (
            SELECT doc_id, CAST(sum(score_micro) AS BIGINT) AS score_micro,
              count(*) AS n_terms_hit
            FROM scored GROUP BY doc_id),
          r AS (
            SELECT *, row_number() OVER (ORDER BY score_micro DESC, doc_id)
              AS rk FROM agg)
          SELECT rk, doc_id, score_micro, n_terms_hit
          FROM r WHERE rk <= 20 ORDER BY rk""",
    "c92_bpe_pairs" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
          ix AS (
            SELECT tk, unnest(range(1, len(tk))) AS i
            FROM t WHERE len(tk) >= 2),
          p AS (SELECT tk[i] AS w1, tk[i + 1] AS w2 FROM ix),
          c AS (SELECT w1, w2, count(*) AS n_pairs FROM p GROUP BY w1, w2),
          r AS (
            SELECT *, row_number() OVER (ORDER BY n_pairs DESC, w1, w2)
              AS rk FROM c)
          SELECT rk, w1, w2, n_pairs, w1 || '_' || w2 AS merged
          FROM r WHERE rk <= 20 ORDER BY rk"""
  )
}
