package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** DSIR-style data selection with importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every corpus document by how target-like its
  * unigram distribution is — the per-token mean log-likelihood ratio
  * between an add-1-smoothed target LM and the raw-corpus LM — then
  * keep the top slice. The hashed-n-gram variant in the paper reduces
  * to exactly this shape with words as the features.
  *
  * Scale shape: ONE token explode feeds both LMs (conditional
  * aggregates split target from raw — no second corpus scan); the
  * word-weight table is |vocab| rows (≪ corpus; Zipf caps it in the
  * tens of millions at 100 TB) and joins back to tokens on the word
  * key — AQE picks broadcast while the vocab fits and a shuffle join
  * beyond that. Global totals are a 1-row aggregate crossed in via
  * broadcast; nothing collects to the driver.
  */
object Importance {

  /** Per-word smoothed log-likelihood ratios: (word, rc, tc, lw) where
    * lw = ln((tc+1)/(t_tot+V)) − ln((rc+1)/(r_tot+V)). The word-count
    * table persists (|vocab| rows — Zipf-capped, ≪ corpus) so the
    * totals aggregate reads the cache instead of re-exploding the
    * corpus: without it the plan scans the corpus three times (score
    * join, LM build, totals), with it exactly twice — the minimum for
    * a two-pass selection (build LM, then score). */
  def wordLogRatios(toks: DataFrame, word: Column, isTarget: Column): DataFrame = {
    val wc = toks.groupBy(word.as("word"))
      .agg(count(lit(1)).as("rc"),
        sum(when(isTarget, 1L).otherwise(0L)).as("tc"))
      .persist()
    val totals = wc.agg(sum(col("rc")).as("r_tot"), sum(col("tc")).as("t_tot"),
      count(lit(1)).as("v"))
    wc.crossJoin(broadcast(totals))
      .select(col("word"), col("rc"), col("tc"),
        (log((col("tc") + 1).cast("double") / (col("t_tot") + col("v")).cast("double")) -
          log((col("rc") + 1).cast("double") / (col("r_tot") + col("v")).cast("double")))
          .as("lw"))
  }

  /** Per-document DSIR scores: mean word log-ratio over the document's
    * tokens (docs with no tokens are absent). Output: id, n_toks,
    * score (unrounded double). */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column): DataFrame = {
    val toks = docs.select(col(idCol), isTarget.as("__t"),
      explode(Fns.tokens(col(textCol))).as("word"))
    val weights = wordLogRatios(toks, col("word"), col("__t"))
      .select(col("word"), col("lw"))
    // EXPLICIT broadcast of the weight table (guide §3.1, same bug as
    // [[trigramPerplexity]]): both join sides carry explode-descended
    // planner estimates, and the UN-hinted plan broadcast the wrong
    // one — a BroadcastExchange over Generate(corpus tokens), i.e. the
    // corpus-scale side, which at real scale is a guaranteed driver
    // OOM. The weight side is the one the operator's scale contract
    // bounds (|vocab| rows, Zipf-capped ≪ corpus); if a deployment's
    // vocab ever outgrows broadcast, hash the features first (the
    // DSIR paper's own fixed-dim hashing) rather than dropping the
    // hint — the un-hinted planner would still pick a broadcast, just
    // of the wrong side.
    toks.join(broadcast(weights), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"),
        (sum(col("lw")) / count(lit(1)).cast("double")).as("score"))
  }

  /** Character trigrams of the whitespace-normalized text — the
    * feature CCNet's KenLM stands on, reduced to order 3. Native
    * codegen'd expression: the HOF form (`transform(sequence, i ->
    * substr)`) re-runs the normalization REGEX inside every lambda
    * frame — O(L²) per doc, measured 16 s on a 1.5 M-trigram corpus
    * vs scan-speed here (see [[graft.plans.CharNGrams]]). Empty array
    * under 3 chars. */
  def charTrigrams(text: Column): Column =
    graft.plans.Cols.column(
      graft.plans.CharNGrams(
        graft.plans.Cols.expression(Fns.normText(text)), 3))

  /** CCNet-style perplexity scoring (Wenzek et al. 2020), self-trained:
    * an add-1-smoothed char-trigram unigram LM over the corpus scores
    * each document's cross-entropy H (bits/trigram) and perplexity
    * 2^H. Same two-pass shape as [[dsirScores]]: the |trigram-vocab|
    * count table persists (≤ charset³ rows — structurally capped), so
    * the corpus is scanned exactly twice. Output: id, n_trigrams, h
    * (unrounded bits), ppl (unrounded). */
  def trigramPerplexity(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val tris = docs.select(col(idCol),
      explode(charTrigrams(col(textCol))).as("tri"))
    val tc = tris.groupBy(col("tri")).agg(count(lit(1)).as("c")).persist()
    val totals = tc.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    val probs = tc.crossJoin(broadcast(totals))
      .select(col("tri"),
        log2((col("c") + 1).cast("double") / (col("n") + col("v")).cast("double"))
          .as("lp"))
    // EXPLICIT broadcast (guide §3.1): probs is structurally capped at
    // charset³ rows (CCNet LM tables are MB-sized), but its planner
    // ESTIMATE descends from the corpus explode, so without the hint
    // the join planned shuffle-side and exchanged the full |corpus
    // trigrams| stream keyed by trigram — a 14.7M-row string shuffle
    // at sf1 that AQE then coalesced into ONE join task (6.2 s, the
    // r12 "accepted trade" regression). AQE did replan to broadcast
    // once the tc cache's real 47 KB stats landed, but only after the
    // big exchange had already materialized. With the hint the scored
    // stream never shuffles: score + per-doc partial agg ride the scan
    // partitions.
    tris.join(broadcast(probs), "tri")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        (-sum(col("lp")) / count(lit(1)).cast("double")).as("h"))
      .withColumn("ppl", pow(lit(2.0), col("h")))
  }
}
