package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.Fns
import graft.plans.Cols

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

  /** [[flagged]] with a Bloom-filter pre-pass — IDENTICAL output (the
    * exact join removes Bloom false positives), different scale shape.
    *
    * `flagged` ships the eval n-gram *strings* to every task (~40-80
    * bytes/gram); here the per-task payload is a Bloom filter at ~1.2
    * bytes/gram (fpp 1%), and the exact-confirm join's probe side
    * shrinks from every corpus n-gram to true hits + fpp·|corpus
    * grams|. That is what keeps decontamination against a LARGE eval
    * union (every benchmark + held-out shards, 10⁸-10⁹ grams) viable:
    * the gram set stops broadcasting long before its Bloom bits do,
    * and the survivors are few enough for a shuffle join.
    *
    * The membership test is Spark's own codegen'd
    * `BloomFilterMightContain` over `xxhash64(gram)` — the same
    * expression pair `InjectRuntimeFilter` plants for runtime row
    * filtering, so the filter sits inside the scan's codegen span.
    * The filter is built driver-side from the eval grams (driver-sized
    * by the same assumption that lets `flagged` broadcast them). */
  def flaggedBloom(corpus: DataFrame, idCol: String, textCol: String,
                   eval: DataFrame, evalTextCol: String,
                   n: Int = 8, minHits: Int = 1,
                   fpp: Double = 0.01): DataFrame = {
    val grams = evalNGrams(eval, evalTextCol, n)
    val hashes = grams.select(xxhash64(col("gram"))).collect().map(_.getLong(0))
    val bf = BloomFilter.create(math.max(hashes.length.toLong, 1L), fpp)
    hashes.foreach(bf.putLong)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val mightContain = Cols.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      Cols.expression(xxhash64(col("gram")))))
    corpus.select(col(idCol),
        explode(array_distinct(Fns.wordNGrams(Fns.tokens(col(textCol)), n)))
          .as("gram"))
      .filter(mightContain)
      .join(broadcast(grams), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** Fractional overlap (the GPT-3 appendix-C form): instead of a hit
    * threshold, report each document's CONTAMINATED FRACTION — the
    * share of its distinct n-grams that appear in the eval set — so
    * the pipeline can gate on "more than x% overlapped" rather than
    * "any overlap". Docs with fewer than n tokens have no n-grams and
    * are absent. Same scale shape as [[flagged]] (broadcast semi-join,
    * one corpus scan); the LEFT join keeps clean docs so the fraction
    * is computed over every eligible document, with the denominator
    * counted in the SAME aggregation as the hits (no second pass).
    * Output: id, n_shingles, n_hits, frac (unrounded). */
  def overlapFraction(corpus: DataFrame, idCol: String, textCol: String,
                      eval: DataFrame, evalTextCol: String,
                      n: Int = 8): DataFrame = {
    val grams = evalNGrams(eval, evalTextCol, n).withColumn("hit", lit(1L))
    corpus.select(col(idCol),
        explode(array_distinct(Fns.wordNGrams(Fns.tokens(col(textCol)), n)))
          .as("gram"))
      .join(broadcast(grams), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("frac",
        col("n_hits").cast("double") / col("n_shingles").cast("double"))
  }
}
