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

  /** The (bands, rows) configurations a 128-hash MinHash signature can
    * split into, with the S-curve P(candidate | jaccard=s) =
    * 1−(1−s^r)^b evaluated at each decile midpoint. Constants computed
    * ONCE here and inlined into BOTH engines' plans — the S-curve is
    * data-independent, so neither engine re-derives a float. */
  private val lshConfigs = Seq((64, 2), (32, 4), (16, 8), (8, 16))

  private def collidePpm(b: Int, r: Int, bucket: Int): Long = {
    val s = (2 * bucket + 1) / 20.0
    math.round((1.0 - math.pow(1.0 - math.pow(s, r), b)) * 1e6)
  }

  private def curveRows: Seq[(Int, Int, Long, Long)] =
    lshConfigs.flatMap { case (b, r) =>
      (1 to 9).map(k => (b, r, k.toLong, collidePpm(b, r, k)))
    }

  /** C91: LSH band planner — pick (bands, rows) from THIS corpus's
    * similarity mass instead of folklore. Ground truth mass: exact
    * 5-gram Jaccard deciles over a DECLARED 1-in-10 doc sample
    * (inverted-index shingle join, c4's verify shape without the
    * prefix filter — the sample pays 1/100 of the full bill). Each
    * 128-hash split's S-curve then prices, per config: expected
    * candidate mass, expected recall above τ=0.5, and wasted
    * candidate mass below τ — the c50/c61/c75 accounting BEFORE the
    * banding is built rather than after. Pairs sharing zero shingles
    * (j < 0.1 bucket too) are excluded by declaration: their collide
    * probability is ≤ 60 ppm across these configs, noise next to the
    * decision the table drives. */
  private def c91BandPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // planted-positive convention (c4): the near-dup corpus's copies
    // land in the 1-in-10 sample with their originals (id+1e6 keeps
    // id%10), so the high-similarity buckets are non-vacuous
    val sample = TrainingQueries.corpusWithDups(T(s, dir, "documents"))
      .filter(col("doc_id") % 10 === 0)
    val sets = sample.select(col("doc_id"),
        array_distinct(Fns.wordNGrams(Fns.tokens(col("text")), 5)).as("shs"))
      .filter(size(col("shs")) > 0)
      .persist()
    val sh = sets.select(col("doc_id"), size(col("shs")).as("n_sh"),
      explode(col("shs")).as("sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.n_sh").as("s1"), col("b.n_sh").as("s2"))
      .agg(count(lit(1)).as("n_inter"))
    val mass = inter
      .select(least(expr(
        """CAST(round(round(n_inter / (s1 + s2 - n_inter), 6) * 1000000)
           AS BIGINT) div 100000"""), lit(9L)).as("bucket"))
      .filter(col("bucket") >= 1)
      .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
    val curve = curveRows.toDF("n_bands", "n_rows", "bucket", "collide_ppm")
    mass.join(broadcast(curve), "bucket")
      .groupBy("n_bands", "n_rows")
      .agg(
        sum(col("n_pairs") * col("collide_ppm")).as("exp_candidates_ppm"),
        coalesce(sum(when(col("bucket") >= 5,
          col("n_pairs") * col("collide_ppm"))), lit(0L)).as("hit_hi_ppm"),
        coalesce(sum(when(col("bucket") >= 5, col("n_pairs"))), lit(0L))
          .as("n_hi"),
        coalesce(sum(when(col("bucket") < 5,
          col("n_pairs") * col("collide_ppm"))), lit(0L)).as("wasted_lo_ppm"))
      .select(col("n_bands"), col("n_rows"), col("exp_candidates_ppm"),
        expr("CASE WHEN n_hi > 0 THEN hit_hi_ppm div n_hi ELSE 0 END")
          .as("exp_recall_ppm"),
        col("wasted_lo_ppm"))
      .orderBy(col("n_bands").desc)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c90_bm25" -> (c90Bm25 _),
    "c91_band_planner" -> (c91BandPlanner _),
    "c92_bpe_pairs" -> (c92BpePairs _)
  )

  private val toksSql = """regexp_extract_all(lower(trim(text)), '\S+')"""

  private def curveValuesSql: String = curveRows
    .map { case (b, r, k, p) => s"($b, $r, $k, $p)" }.mkString(", ")

  def oracleSql: Map[String, String] = Map(
    "c91_band_planner" ->
      s"""WITH ${TrainingQueries.corpusSql},
          t AS (
            SELECT doc_id, $toksSql AS tk FROM corpus
            WHERE doc_id % 10 = 0),
          shd0 AS (
            SELECT doc_id, list_distinct(${TrainingQueries.ngramsSql(5)}) AS shs
            FROM t),
          shd AS (SELECT doc_id, shs FROM shd0 WHERE len(shs) > 0),
          sh AS (
            SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS sh FROM shd),
          inter AS (
            SELECT a.doc_id AS id1, b.doc_id AS id2,
              a.n_sh AS s1, b.n_sh AS s2, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4),
          mass AS (
            SELECT bucket, count(*) AS n_pairs FROM (
              SELECT least(CAST(round(round(n_inter / (s1 + s2 - n_inter), 6)
                * 1000000) AS BIGINT) // 100000, 9) AS bucket
              FROM inter)
            WHERE bucket >= 1 GROUP BY bucket),
          curve(n_bands, n_rows, bucket, collide_ppm) AS (
            VALUES $curveValuesSql),
          agg AS (
            SELECT n_bands, n_rows,
              CAST(sum(n_pairs * collide_ppm) AS BIGINT) AS exp_candidates_ppm,
              CAST(coalesce(sum(CASE WHEN bucket >= 5
                THEN n_pairs * collide_ppm END), 0) AS BIGINT) AS hit_hi_ppm,
              CAST(coalesce(sum(CASE WHEN bucket >= 5 THEN n_pairs END), 0)
                AS BIGINT) AS n_hi,
              CAST(coalesce(sum(CASE WHEN bucket < 5
                THEN n_pairs * collide_ppm END), 0) AS BIGINT) AS wasted_lo_ppm
            FROM mass JOIN curve USING (bucket) GROUP BY 1, 2)
          SELECT n_bands, n_rows, exp_candidates_ppm,
            CASE WHEN n_hi > 0 THEN hit_hi_ppm // n_hi ELSE 0 END
              AS exp_recall_ppm,
            wasted_lo_ppm
          FROM agg ORDER BY n_bands DESC""",
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
