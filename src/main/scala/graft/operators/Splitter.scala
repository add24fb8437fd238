package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training
  * pipelines: assignment is a pure function of the row's id hash, so
  * it's reproducible across runs, engines, and cluster layouts — and
  * stays stable when the corpus grows (a new document never flips an
  * old one's split, the property random split-by-index lacks).
  *
  * Mechanics: the first 8 hex chars of md5 are a uniform 32-bit value;
  * fixed-width lowercase hex compares lexicographically as numerically,
  * so a fraction p becomes a hex-string threshold and the whole
  * assignment is one codegen'd projection — no shuffle, no RNG state,
  * nothing to coordinate across 1000 executors. */
object Splitter {

  /** Hex threshold for fraction p of the 32-bit hash space. */
  private[graft] def hexThreshold(p: Double): String = {
    require(p >= 0.0 && p <= 1.0, s"fraction must be in [0,1], got $p")
    f"${math.min((p * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  private def bucket(c: Column): Column = substring(md5(c.cast("string")), 1, 8)

  /** Adds a `split` column from cumulative fractions, e.g.
    * `Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)`. The last
    * named split absorbs any rounding remainder. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val b = bucket(col(idCol))
    val assigned = splits.init.zip(cum.init).foldRight(
        lit(splits.last._1): Column) { case (((name, _), c), acc) =>
      when(b < lit(hexThreshold(c)), name).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /** Keep a deterministic `fraction` of rows per stratum: the hash is
    * salted with the stratum key, so the same id can survive in one
    * stratum and not another and strata stay independent. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       fraction: Double): DataFrame =
    df.filter(
      bucket(concat_ws("#", col(strataCol), col(idCol))) <
        lit(hexThreshold(fraction)))

  /** Apply per-stratum mixing factors by deterministic fractional
    * replication (the "epochs" step of a data-mixing recipe: factor
    * 2.3 ≙ every doc twice, and a hash-chosen 30% a third time — in
    * expectation the stratum is weighted by exactly 2.3). Emits one
    * row per copy (`copy_id` 1..n) plus the row's `n_copies`.
    *
    * Same determinism story as the rest of the splitter: the extra
    * copy is decided by the stratum-salted id hash against a
    * precomputed hex threshold, so the mix is reproducible across
    * runs, engines, and cluster layouts, and stable under corpus
    * growth. The replication is a generator (`explode(sequence)`),
    * no shuffle; downstream shuffles see at most ⌈max factor⌉× the
    * rows. Strata absent from `factors` get `default`. */
  def upsample(df: DataFrame, strataCol: String, idCol: String,
               factors: Map[String, Double], default: Double = 1.0): DataFrame = {
    require((factors.values ++ Seq(default)).forall(f => f >= 0 && f < 100),
      "factors must be in [0, 100)")
    def base(f: Double): Long = math.floor(f).toLong
    def frac(f: Double): Double = f - math.floor(f)
    val salted = bucket(concat_ws("#", col(strataCol), col(idCol)))
    val nCopies = factors.foldRight(
        lit(base(default)) + when(salted < lit(hexThreshold(frac(default))), 1L)
          .otherwise(0L): Column) { case ((stratum, f), acc) =>
      when(col(strataCol) === stratum,
        lit(base(f)) + when(salted < lit(hexThreshold(frac(f))), 1L)
          .otherwise(0L))
        .otherwise(acc)
    }
    df.withColumn("n_copies", nCopies.cast("long"))
      .filter(col("n_copies") > 0)
      .withColumn("copy_id", explode(sequence(lit(1L), col("n_copies"))))
  }
}
