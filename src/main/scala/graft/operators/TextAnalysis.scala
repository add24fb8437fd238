package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, fingerprinting. All pure Column
  * compositions (codegen'd, no UDFs); every scan computes its metrics
  * in a single projection so a 100 TB corpus is one pass.
  */
object TextAnalysis {

  /** Marker-word sets for the n-gram/stopword language heuristic.
    * Deterministic tie-break: first language in this order wins. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "los", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "zh" -> Seq("的", "是", "在", "了"))

  private def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Predicted language + per-language scores. */
  def langId(text: Column): (Column, Seq[(String, Column)]) = {
    val toks = Fns.tokens(text)
    val scores = langMarkers.map { case (lang, ms) => lang -> markerHits(toks, ms) }
    val best = greatest(scores.map(_._2): _*)
    val pred = scores.foldRight(lit("unknown")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
    (pred, scores)
  }

  /** BPE-ish token pattern: letter runs, single digits, single
    * punctuation marks — the shape GPT-style pre-tokenizers produce. */
  val BpeRe = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  /** Null text counts as zero tokens (size(null) is null under ANSI —
    * a null count would silently drop rows from sums and averages). */
  def wsTokenCount(text: Column): Column = size(Fns.tokens(coalesce(text, lit(""))))

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(coalesce(text, lit("")), lit(BpeRe), lit(0)))

  /** Quality metrics in one projection. Ratios rounded for
    * cross-engine float stability. Pass a pre-projected token column
    * via [[qualityColsFrom]] when scanning large corpora — the token
    * regex then runs once per row, not once per metric (HOF metrics
    * are interpreted; codegen CSE can't dedupe across them). */
  def qualityCols(text: Column): Seq[(String, Column)] = {
    val t = coalesce(text, lit("")) // null text scores as empty, not 0.75
    qualityColsFrom(t, Fns.tokens(t))
  }

  /** All ratio rounding happens in INTEGER micro-units: `round()` to a
    * fractional scale multiplies by 10^k first, and when the input is
    * itself a short decimal the product can land a hair's width from
    * x.5 — Spark (exact BigDecimal) and DuckDB (scaled double) then
    * disagree by 1e-6 (observed: score 0.6578175 at sf0.1). Rounding
    * to scale 0 has no scaling multiply, so identical doubles round
    * identically; the integers then divide exactly the same way. */
  def qualityColsFrom(text: Column, toks: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val nToks = size(toks)
    val nonWs = length(regexp_replace(text, "\\s", ""))
    val punctN = nChars - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))
    val stopHits = markerHits(toks, langMarkers.flatMap(_._2).distinct)
    val mtl4 = when(nToks > 0, round(nonWs * lit(10000.0) / nToks)).otherwise(0L)
    val pr6 = when(nChars > 0, round(punctN * lit(1000000.0) / nChars)).otherwise(0L)
    val sr6 = when(nToks > 0, round(stopHits * lit(1000000.0) / nToks)).otherwise(0L)
    val ls6 = least(nToks.cast("bigint") * 10000L, lit(1000000L))
    // 4e6 × score, then HALF_UP the /4 in integers
    val scoreX4 = lit(2L) * ls6 + (lit(1000000L) - pr6) + least(lit(5L) * sr6, lit(1000000L))
    val score6 = floor((scoreX4 + lit(2L)) / lit(4L))
    Seq(
      "n_chars" -> nChars.cast("bigint"),
      "n_tokens" -> nToks.cast("bigint"),
      "mean_token_len" -> (mtl4 / lit(10000.0)),
      "punct_ratio" -> (pr6 / lit(1000000.0)),
      "stopword_ratio" -> (sr6 / lit(1000000.0)),
      "quality_score" -> (score6 / lit(1000000.0)))
  }

  /** The integer micro-unit quality score — exactly what
    * [[qualityCols]] surfaces as `quality_score` × 10⁶, kept as a
    * LONG for consumers that rank or threshold on it (a double
    * round-trip through /10⁶ is not guaranteed to recover the
    * integer). Same formula, same null-text behavior. */
  def qualityScoreMicro(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val toks = Fns.tokens(t)
    val nChars = length(t)
    val nToks = size(toks)
    val punctN = nChars - length(regexp_replace(t, "[^A-Za-z0-9\\s]", ""))
    val stopHits = markerHits(toks, langMarkers.flatMap(_._2).distinct)
    val pr6 = when(nChars > 0,
      round(punctN * lit(1000000.0) / nChars)).otherwise(0L)
    val sr6 = when(nToks > 0,
      round(stopHits * lit(1000000.0) / nToks)).otherwise(0L)
    val ls6 = least(nToks.cast("bigint") * 10000L, lit(1000000L))
    val scoreX4 = lit(2L) * ls6 + (lit(1000000L) - pr6) +
      least(lit(5L) * sr6, lit(1000000L))
    floor((scoreX4 + lit(2L)) / lit(4L)).cast("long")
  }

  /** Quality metrics as a layered plan: raw counts → ratios → score.
    * Each layer references the previous one's columns more than once,
    * so CollapseProject keeps them materialized per row instead of
    * re-inlining the token regex / stopword filter into every
    * consumer (the single-projection form evaluated the INSET filter
    * and the punct regex twice per row). Values are identical to
    * [[qualityColsFrom]]. */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // null text behaves as "" — otherwise least() skips the null length
    // term and a null doc would score 0.75, above most real documents.
    val t = coalesce(col(textCol), lit(""))
    val raw = df
      .select(col(idCol), t.as("__text"), Fns.tokens(t).as("__tk"))
      .select(col(idCol),
        length(col("__text")).as("__nchars"),
        size(col("__tk")).as("__ntoks"),
        length(regexp_replace(col("__text"), "\\s", "")).as("__nonws"),
        (length(col("__text")) -
          length(regexp_replace(col("__text"), "[^A-Za-z0-9\\s]", ""))).as("__punct"),
        markerHits(col("__tk"), langMarkers.flatMap(_._2).distinct).as("__stop"))
    // integer micro-units throughout — see qualityColsFrom's scaladoc
    val ratios = raw.select(col(idCol),
      col("__nchars"), col("__ntoks"),
      when(col("__ntoks") > 0,
        round(col("__nonws") * lit(10000.0) / col("__ntoks"))).otherwise(0L)
        .as("__mtl4"),
      when(col("__nchars") > 0,
        round(col("__punct") * lit(1000000.0) / col("__nchars"))).otherwise(0L)
        .as("__pr6"),
      when(col("__ntoks") > 0,
        round(col("__stop") * lit(1000000.0) / col("__ntoks"))).otherwise(0L)
        .as("__sr6"),
      least(col("__ntoks").cast("bigint") * 10000L, lit(1000000L)).as("__ls6"))
    val scoreX4 = lit(2L) * col("__ls6") + (lit(1000000L) - col("__pr6")) +
      least(lit(5L) * col("__sr6"), lit(1000000L))
    ratios.select(col(idCol),
      col("__nchars").cast("bigint").as("n_chars"),
      col("__ntoks").cast("bigint").as("n_tokens"),
      (col("__mtl4") / lit(10000.0)).as("mean_token_len"),
      (col("__pr6") / lit(1000000.0)).as("punct_ratio"),
      (col("__sr6") / lit(1000000.0)).as("stopword_ratio"),
      (floor((scoreX4 + lit(2L)) / lit(4L)) / lit(1000000.0)).as("quality_score"))
  }

  /** Repetition metrics (the Gopher/MassiveText "repeated n-gram"
    * quality rule): how much of a document is duplicated n-grams.
    * Ratio in integer micro-units — (total-distinct)·10⁶ is an exact
    * integer in a double, the divide is one IEEE op, floor is
    * tie-free — identical on both engines. */
  def repetitionCols(toks: Column, n: Int): Seq[(String, Column)] = {
    val grams = Fns.wordNGrams(toks, n)
    val total = size(grams).cast("long")
    val dist = size(array_distinct(grams)).cast("long")
    Seq(
      "n_grams" -> total,
      "n_distinct_grams" -> dist,
      "dup_ratio_micro" ->
        when(total > 0,
          floor((total - dist) * lit(1000000.0) / total).cast("long"))
          .otherwise(0L))
  }

  /** C4-style URL-density quality rule: documents whose token stream
    * is dominated by links are boilerplate/link-farm pages, not prose.
    * Counts `http(s)://…` and `www.…` spans, scores density in integer
    * micro-units (urls·10⁶/tokens — exact integer in a double, one
    * IEEE divide, tie-free floor on both engines). One projection, no
    * shuffle — composes into any quality gate like [[qualityCols]]. */
  def urlCols(text: Column, flagMicro: Long = 5000L): Seq[(String, Column)] = {
    val urls = regexp_extract_all(text, lit("""https?://\S+|www\.\S+"""), lit(0))
    val nToks = size(Fns.tokens(text)).cast("long")
    val nUrls = size(urls).cast("long")
    val density = when(nToks > 0,
      floor(nUrls * lit(1000000.0) / nToks).cast("long")).otherwise(0L)
    Seq(
      "n_urls" -> nUrls,
      "n_tokens" -> nToks,
      "url_density_micro" -> density,
      "flagged" -> (density >= flagMicro).cast("int"))
  }

  /** Canonical form of a URL — the crawl-dedup key (Common-Crawl-style
    * URL-level dedup): lowercase, scheme and `www.` stripped, query
    * string / fragment / trailing slash dropped. A pure expression
    * chain (4 anchored regexp_replace over one value), codegen'd. */
  def canonicalUrl(url: Column): Column =
    Seq("^https?://" -> "", "^www\\." -> "", "[?#].*$" -> "", "/$" -> "")
      .foldLeft(lower(url)) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** C4-style blocklist ("bad words") quality rule: occurrence and
    * distinct-term counts against a fixed term list, plus the drop
    * flag. The list ships as a literal array (broadcast-by-value into
    * every task — the real-world list is thousands of terms, still
    * KBs); the scan is one projection, no shuffle, no join. */
  def blocklistCols(toks: Column, terms: Seq[String]): Seq[(String, Column)] = {
    require(terms.nonEmpty, "blocklist needs at least one term")
    val termArr = array(terms.map(lit): _*)
    val hits = filter(toks, t => array_contains(termArr, t))
    val nHits = size(hits).cast("long")
    Seq(
      "n_blocked" -> nHits,
      "n_distinct_blocked" ->
        size(array_intersect(array_distinct(toks), termArr)).cast("long"),
      "blocked" -> (nHits > 0).cast("long"))
  }

  /** Gopher's exact stopword-presence list (Rae et al. 2021, table A1:
    * "contains at least 2 of: the, be, to, of, and, that, have, with"). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The composed Gopher/MassiveText quality GATE (Rae et al. 2021
    * §A1.1): the rule set that decides keep/drop, not just a score.
    * Five rules, each surfaced as an integer metric plus a failure bit
    * in `reasons` (bit i set = rule i failed); `keep` = no bits set.
    *
    *   bit 0 — word count outside [minTokens, maxTokens]
    *   bit 1 — mean token length outside [3, 10] chars
    *   bit 2 — alphabetic-word ratio < 80% (tokens containing a letter)
    *   bit 3 — symbol-token ratio > 10% (tokens with no alphanumerics)
    *   bit 4 — fewer than 2 distinct Gopher stopwords
    *
    * All metrics are integer micro-units (exact in a double, one IEEE
    * divide, tie-free floor) so the gate decision is bit-identical
    * cross-engine. One projection over the token array — no shuffle;
    * at 100 TB this rides the ingest scan for free. */
  def gopherGateCols(text: Column,
                     minTokens: Long = 30L,
                     maxTokens: Long = 100000L): Seq[(String, Column)] = {
    val t = coalesce(text, lit(""))
    val toks = Fns.tokens(t)
    val nToks = size(toks).cast("long")
    val nonWs = length(regexp_replace(t, "\\s", "")).cast("long")
    // mean token length in 1e-4 chars (same micro form as qualityCols)
    val mtl4 = when(nToks > 0, round(nonWs * lit(10000.0) / nToks).cast("long"))
      .otherwise(0L)
    val alphaN = size(filter(toks, tk => tk.rlike("[a-z]"))).cast("long")
    val symN = size(filter(toks, tk => !tk.rlike("[a-z0-9]"))).cast("long")
    val alphaMicro = when(nToks > 0,
      floor(alphaN * lit(1000000.0) / nToks).cast("long")).otherwise(0L)
    val symMicro = when(nToks > 0,
      floor(symN * lit(1000000.0) / nToks).cast("long")).otherwise(0L)
    val stopArr = array(gopherStopwords.map(lit): _*)
    val nStop = size(array_intersect(array_distinct(toks), stopArr)).cast("long")
    val fails = Seq(
      nToks < minTokens || nToks > maxTokens,
      mtl4 < 30000L || mtl4 > 100000L,
      alphaMicro < 800000L,
      symMicro > 100000L,
      nStop < 2L)
    val reasons = fails.zipWithIndex
      .map { case (f, i) => when(f, lit(1L << i)).otherwise(0L) }
      .reduce(_ + _)
    Seq(
      "n_tokens" -> nToks,
      "mean_token_len_x4" -> mtl4,
      "alpha_micro" -> alphaMicro,
      "sym_micro" -> symMicro,
      "n_stopwords" -> nStop,
      "reasons" -> reasons,
      "keep" -> (reasons === 0L).cast("long"))
  }

  /** Document fingerprints: whole-text md5 over the canonical form, and
    * a min-shingle fingerprint (the 1-hash special case of MinHash —
    * robust to local edits the way winnowing selections are). */
  def fingerprintCols(text: Column, shingleN: Int = 5): Seq[(String, Column)] = {
    val sh = Fns.wordNGrams(Fns.tokens(text), shingleN)
    Seq(
      "fp_md5" -> md5(Fns.normText(text)),
      "fp_minshingle" -> array_min(transform(sh, s => md5(s))),
      "n_shingles" -> size(array_distinct(sh)).cast("bigint"))
  }
}
