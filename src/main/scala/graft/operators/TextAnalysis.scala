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

  def qualityColsFrom(text: Column, toks: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val nToks = size(toks)
    val nonWs = length(regexp_replace(text, "\\s", ""))
    val punctN = nChars - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))
    val stopHits = markerHits(toks, langMarkers.flatMap(_._2).distinct)
    val meanTokLen = when(nToks > 0, round(nonWs.cast("double") / nToks, 4)).otherwise(0.0)
    val punctRatio = when(nChars > 0, round(punctN.cast("double") / nChars, 6)).otherwise(0.0)
    val stopRatio = when(nToks > 0, round(stopHits.cast("double") / nToks, 6)).otherwise(0.0)
    val lengthScore = least(nToks.cast("double") / 100.0, lit(1.0))
    val score = round(lit(0.5) * lengthScore + lit(0.25) * (lit(1.0) - punctRatio)
      + lit(0.25) * least(stopRatio * 5.0, lit(1.0)), 6)
    Seq(
      "n_chars" -> nChars.cast("bigint"),
      "n_tokens" -> nToks.cast("bigint"),
      "mean_token_len" -> meanTokLen,
      "punct_ratio" -> punctRatio,
      "stopword_ratio" -> stopRatio,
      "quality_score" -> score)
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
    val ratios = raw.select(col(idCol),
      col("__nchars"), col("__ntoks"),
      when(col("__ntoks") > 0,
        round(col("__nonws").cast("double") / col("__ntoks"), 4)).otherwise(0.0)
        .as("mean_token_len"),
      when(col("__nchars") > 0,
        round(col("__punct").cast("double") / col("__nchars"), 6)).otherwise(0.0)
        .as("punct_ratio"),
      when(col("__ntoks") > 0,
        round(col("__stop").cast("double") / col("__ntoks"), 6)).otherwise(0.0)
        .as("stopword_ratio"),
      least(col("__ntoks").cast("double") / 100.0, lit(1.0)).as("__ls"))
    ratios.select(col(idCol),
      col("__nchars").cast("bigint").as("n_chars"),
      col("__ntoks").cast("bigint").as("n_tokens"),
      col("mean_token_len"), col("punct_ratio"), col("stopword_ratio"),
      round(lit(0.5) * col("__ls") + lit(0.25) * (lit(1.0) - col("punct_ratio"))
        + lit(0.25) * least(col("stopword_ratio") * 5.0, lit(1.0)), 6)
        .as("quality_score"))
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
