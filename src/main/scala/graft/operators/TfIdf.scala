package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Corpus term statistics: TF-IDF term ranking and vocabulary — the
  * "what is this corpus made of" operators a training-data pipeline
  * runs before filtering (reference scope addition; SURVEY §2C).
  *
  * Cross-engine determinism: the score is integer-scaled rational
  * tf·N·10^6 / df (floor) — same ranking family as tf·ln(N/df) for
  * fixed N (both monotone in tf and 1/df), but exact on both engines;
  * ln() on doubles is libm-dependent and hash-flakes the oracle.
  *
  * Scale shape: ONE corpus scan — explode → partial-agg groupBy on
  * (doc, term), then doc-frequency as a count window over the
  * aggregated (vocab-sized) rows rather than a join against a second
  * derivation of the same aggregate (a DataFrame fork would re-scan
  * and re-explode the whole corpus; at 100 TB the scan dominates
  * everything else). Two further shuffles move only aggregated rows:
  * word (doc-freq window) and doc (top-k rank, pruned by
  * WindowGroupLimit below the exchange). The corpus-size scalar N
  * broadcasts as a 1-row cross join.
  */
object TfIdf {

  /** Per-document term frequencies over whitespace tokens. */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(Fns.tokens(col(textCol))).as("word"))
      .groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("term_freq"))

  /** Top-k terms per document by integer-scaled TF-IDF.
    * Output: (id, rk, word, term_freq, doc_freq, score_micro). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("word"))
    tf.withColumn("doc_freq",
        count(lit(1)).over(Window.partitionBy(col("word"))))
      .crossJoin(broadcast(n))
      .withColumn("score_micro",
        expr("(term_freq * 1000000 * n_docs) div doc_freq"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("rk"), col("word"),
        col("term_freq"), col("doc_freq"), col("score_micro"))
  }

  /** Corpus vocabulary: per-word total occurrences and document
    * frequency, ranked by (total desc, word). */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    tf.groupBy(col("word"))
      .agg(sum(col("term_freq")).as("n_total"), count(lit(1)).as("n_docs"))
      .withColumn("rk",
      // bounded input: the vocab rollup (|distinct words| ≪ tokens);
      // rank filters over it plan as WindowGroupLimit
        row_number().over(Window.orderBy(col("n_total").desc, col("word"))))
  }
}
