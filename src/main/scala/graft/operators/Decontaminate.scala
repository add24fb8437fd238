package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Benchmark decontamination: flag corpus documents that share long
  * n-grams with an evaluation set — the overlap check every serious
  * training-data pipeline runs before training (the GPT-3 paper's
  * 13-gram dedup against benchmarks is the canonical form).
  *
  * Scale shape: the eval set is tiny next to the corpus (benchmarks
  * are thousands of rows, the corpus is 100 TB), so its distinct
  * n-gram set BROADCASTS; the corpus side is one scan + explode +
  * broadcast-hash semi-join — no shuffle of corpus data at all. The
  * per-doc match count aggregates on doc_id (pre-partitioned by the
  * scan's natural grouping; partial agg keeps it one exchange of
  * flagged docs only).
  */
object Decontaminate {

  /** Distinct `n`-grams of each eval row's text. */
  def evalNGrams(eval: DataFrame, textCol: String, n: Int): DataFrame =
    eval.select(explode(array_distinct(
        Fns.wordNGrams(Fns.tokens(col(textCol)), n))).as("gram"))
      .distinct()

  /** Per-contaminated-doc overlap counts: (id, n_hits) for corpus
    * docs sharing ≥ minHits n-grams with the eval set. */
  def flagged(corpus: DataFrame, idCol: String, textCol: String,
              eval: DataFrame, evalTextCol: String,
              n: Int = 8, minHits: Int = 1): DataFrame = {
    val grams = evalNGrams(eval, evalTextCol, n)
    corpus.select(col(idCol),
        explode(array_distinct(Fns.wordNGrams(Fns.tokens(col(textCol)), n)))
          .as("gram"))
      .join(broadcast(grams), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }
}
