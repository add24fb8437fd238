package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.plans.{BottomKByHash, CharNGrams, CosineSimD, DotProductD, HeavyHitters, WordNGrams}

/** Session wiring for the graft engine.
  *
  * [[GraftExtensions]] registers the library's native expressions as
  * SQL functions via the public `SparkSessionExtensions` mechanism, so
  * `spark.sql("SELECT word_ngrams(tk, 5) ...")` works next to the
  * Column API (which lifts the same Expression classes directly):
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or:
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(toks, n) - space-joined sliding n-grams of a token array"),
      (args: Seq[Expression]) => WordNGrams(args.head, intArg(args, 1, "word_ngrams"))))
    ext.injectFunction((FunctionIdentifier("char_ngrams"),
      info("char_ngrams", "char_ngrams(s, n) - sliding n-codepoint windows of a string"),
      (args: Seq[Expression]) => CharNGrams(args.head, intArg(args, 1, "char_ngrams"))))
    ext.injectFunction((FunctionIdentifier("dot_product_d"),
      info("dot_product_d", "dot_product_d(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => DotProductD(args.head, args(1))))
    ext.injectFunction((FunctionIdentifier("cosine_sim_d"),
      info("cosine_sim_d", "cosine_sim_d(a, b) - cosine similarity of two double arrays"),
      (args: Seq[Expression]) => CosineSimD(args.head, args(1))))
    ext.injectFunction((FunctionIdentifier("bottom_k_by_hash"),
      info("bottom_k_by_hash", "bottom_k_by_hash(id, k) - deterministic k-minimum-values sample aggregate"),
      (args: Seq[Expression]) => BottomKByHash(args.head, intArg(args, 1, "bottom_k_by_hash"))))
    ext.injectFunction((FunctionIdentifier("heavy_hitters"),
      info("heavy_hitters", "heavy_hitters(v, capacity) - SpaceSaving top-k sketch aggregate (CH topK)"),
      (args: Seq[Expression]) => HeavyHitters(args.head, intArg(args, 1, "heavy_hitters"))))
    ext.injectFunction((FunctionIdentifier("theta_sketch_agg"),
      info("theta_sketch_agg", "theta_sketch_agg(v) - mergeable theta sketch (CH uniqTheta); supports set algebra"),
      (args: Seq[Expression]) => graft.plans.ThetaSketchAgg(args.head)))
    ext.injectFunction((FunctionIdentifier("theta_estimate"),
      info("theta_estimate", "theta_estimate(sk) - rounded distinct estimate of a theta state"),
      (args: Seq[Expression]) => graft.plans.ThetaEstimate(args.head)))
    ext.injectFunction((FunctionIdentifier("theta_anotb_estimate"),
      info("theta_anotb_estimate", "theta_anotb_estimate(a, b) - estimated |A \\ B|"),
      (args: Seq[Expression]) => graft.plans.ThetaAnotBEstimate(args.head, args(1))))
    ext.injectFunction((FunctionIdentifier("theta_intersect_estimate"),
      info("theta_intersect_estimate", "theta_intersect_estimate(a, b) - estimated |A ∩ B|"),
      (args: Seq[Expression]) => graft.plans.ThetaIntersectEstimate(args.head, args(1))))
    // opt-in CH-uniq() semantics: spark.graft.approxDistinct=true
    // rewrites exact COUNT(DISTINCT x) to an HLL sketch estimate
    ext.injectOptimizerRule(graft.plans.ApproxDistinctRewrite)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  private def intArg(args: Seq[Expression], i: Int, fn: String): Int = args(i) match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn argument ${i + 1} must be an integer literal, got $other")
  }
}

/** Opinionated builder for local/cluster graft sessions: AQE on,
  * sane shuffle parallelism, UTC, nanos-long parquet reads (the
  * events table is TIMESTAMP(NANOS)), extensions registered. */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", math.max(cores, 8)).getOrCreate()
}
