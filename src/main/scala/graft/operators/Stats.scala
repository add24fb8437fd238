package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical aggregates from the ClickHouse surface that Spark has
  * no single built-in for — `entropy`, `welchTTest`, and
  * `exponentialTimeDecayedSum` — each expressed as sufficient-statistic
  * aggregations so they stay one exchange with map-side combine.
  *
  * Reference: stouch/redis-events-to-clickhouse-tables exposes these
  * through ClickHouse's aggregate-function surface on the ingested
  * tables (docs/QUERIES.md); semantics follow ClickHouse's
  * AggregateFunctionEntropy.h / AggregateFunctionTTest.h /
  * AggregateFunctionExponentialTimeDecayedSum shapes.
  *
  * Scale notes: every helper is groupBy over sufficient statistics —
  * counts, Σx, Σx² — so the exchange carries one small row per group
  * regardless of group size, and partial aggregation combines
  * map-side. [[decayedSum]] adds one keyed window over the SAME key as
  * its aggregation, so both ride a single hash exchange.
  */
object Stats {

  /** Tie-corrected ROC AUC per group via the rank-sum identity (the
    * CH `arrayAUC` analog, b104's kernel): with ascending score ranks
    * and average ranks on ties, AUC = (Σ_pos rank_avg − P(P+1)/2) /
    * (P·N); doubling clears the halves, so
    * auc_ppm = (S2 − P(P+1))·1e6 div (2·P·N) with
    * S2 = Σ_score-groups pos·(2·cum_before + n + 1) — every term
    * int64. The (group, score) pre-rollup combines map-side, so
    * DISTINCT scores cross the per-group rank sort, not rows.
    * `label` must be 0/1 long; `score` any orderable integer. */
  def aucBySegment(df: DataFrame, segCol: String, score: Column,
                   label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.select(col(segCol), score.as("__s"), label.as("__y"))
      .groupBy(col(segCol), col("__s"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    val w = Window.partitionBy(col(segCol)).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("cum", sum(col("n")).over(w))
      .groupBy(col(segCol))
      .agg(sum(col("n_pos")).as("p"),
        sum(col("n") - col("n_pos")).as("nn"),
        sum(col("n_pos") * (lit(2L) * (col("cum") - col("n")) + col("n") + lit(1L)))
          .as("s2"))
      .select(col(segCol), col("p").as("n_pos"), col("nn").as("n_neg"),
        expr("(s2 - p * (p + 1)) * 1000000 div (2 * p * nn)").as("auc_ppm"))
  }

  /** Shannon entropy (bits) of the `cat` distribution within each
    * `keys` group: H = log2(n) − Σ c·log2(c) / n. Two aggregations —
    * (keys, cat) counts, then keys — both with partial combine; the
    * second input is already one row per (group, category), so the
    * second exchange moves |groups|·|categories| rows, not data.
    * Output: keys..., n (total rows), entropy_bits (unrounded double:
    * callers round for cross-engine compare). */
  def entropyAgg(df: DataFrame, keys: Seq[String], cat: Column): DataFrame = {
    val kc = keys.map(col)
    val counted = df.groupBy((kc :+ cat.as("__cat")): _*)
      .agg(count(lit(1)).as("__c"))
    counted.groupBy(kc: _*)
      .agg(sum(col("__c")).as("n"),
        sum(col("__c").cast("double") * log2(col("__c").cast("double")))
          .as("__clogc"))
      .select((kc :+ col("n") :+
        (log2(col("n").cast("double")) - col("__clogc") / col("n").cast("double"))
          .as("entropy_bits")): _*)
  }

  /** Welch's unequal-variance t statistic between cohorts A and B of
    * each group, from one pass of conditional sufficient statistics
    * (CH `welchTTest`). Output: keys..., n_a, n_b, mean_a, mean_b, t
    * (all unrounded doubles; t is null when either cohort has < 2 rows
    * or both variances are zero). */
  def welchT(df: DataFrame, keys: Seq[String], value: Column,
             inA: Column, inB: Column): DataFrame = {
    val kc = keys.map(col)
    def sIf(c: Column, e: Column) = sum(when(c, e).otherwise(lit(0.0)))
    def nIf(c: Column) = sum(when(c, 1L).otherwise(0L))
    val agg = df.groupBy(kc: _*).agg(
      nIf(inA).as("n_a"), nIf(inB).as("n_b"),
      sIf(inA, value).as("sa"), sIf(inB, value).as("sb"),
      sIf(inA, value * value).as("qa"), sIf(inB, value * value).as("qb"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val ma = col("sa") / na
    val mb = col("sb") / nb
    // unbiased variance from Σx² − n·m²
    val va = (col("qa") - na * ma * ma) / (na - 1)
    val vb = (col("qb") - nb * mb * mb) / (nb - 1)
    val se2 = va / na + vb / nb
    agg.select((kc ++ Seq(col("n_a"), col("n_b"), ma.as("mean_a"),
      mb.as("mean_b"),
      when(col("n_a") > 1 && col("n_b") > 1 && se2 > 0,
        (ma - mb) / sqrt(se2)).as("t"))): _*)
  }

  /** Two-sample Kolmogorov-Smirnov D between cohorts A and ¬A of each
    * group, EXACT: D = max|cumA·nB − cumB·nA| / (nA·nB) stays
    * all-integer until one final division both engines perform
    * identically — no rounding anywhere. Value ties collapse in the
    * (keys, value) pre-aggregation, so the ECDF step window never
    * sees frame peers and its input is |distinct values| rows.
    * Output: keys..., n_a, n_b, d_num, ks_d. */
  def ks2Sample(df: DataFrame, keys: Seq[String], value: Column,
                inA: Column): DataFrame = {
    val kc = keys.map(col)
    val byKey = Window.partitionBy(kc: _*)
    val steps = Window.partitionBy(kc: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select((kc :+ value.as("__v") :+
        when(inA, 1L).otherwise(0L).as("__a")): _*)
      .groupBy((kc :+ col("__v")): _*)
      .agg(sum(col("__a")).as("__ca"), sum(lit(1L) - col("__a")).as("__cb"))
      .withColumn("__cuma", sum(col("__ca")).over(steps))
      .withColumn("__cumb", sum(col("__cb")).over(steps))
      .withColumn("__na", sum(col("__ca")).over(byKey))
      .withColumn("__nb", sum(col("__cb")).over(byKey))
      .groupBy(kc: _*)
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        max(abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na")))
          .as("d_num"))
      .withColumn("ks_d",
        when(col("n_a") > 0 && col("n_b") > 0,
          col("d_num").cast("double") / (col("n_a") * col("n_b")).cast("double")))
  }

  /** Mann-Whitney U (CH mannWhitneyUTest) between cohorts A and ¬A of
    * each group. The U statistic is EXACT: tied values share the
    * average rank, which in DOUBLED units (2·lo + c + 1) is an
    * integer, so 2·U₁ = Σ cA·r₂ − nA(nA+1) stays integral until one
    * final halving (x.5 doubles are exact). The z statistic finalizes
    * with the tie-corrected normal variance and rounds at the caller.
    * Same collapse-ties-then-step-window shape as [[ks2Sample]].
    * Output: keys..., n_a, n_b, u1 (exact), z (unrounded, null when a
    * cohort is empty or variance is 0). */
  def mannWhitney(df: DataFrame, keys: Seq[String], value: Column,
                  inA: Column): DataFrame = {
    val kc = keys.map(col)
    val steps = Window.partitionBy(kc: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val agg = df.select((kc :+ value.as("__v") :+
        when(inA, 1L).otherwise(0L).as("__a")): _*)
      .groupBy((kc :+ col("__v")): _*)
      .agg(sum(col("__a")).as("__ca"), sum(lit(1L) - col("__a")).as("__cb"))
      .withColumn("__c", col("__ca") + col("__cb"))
      .withColumn("__r2", // doubled average rank of this value's run
        lit(2L) * (sum(col("__c")).over(steps) - col("__c")) + col("__c") + 1L)
      .groupBy(kc: _*)
      .agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"),
        sum(col("__ca") * col("__r2")).as("__r1x2"),
        sum(col("__c") * col("__c") * col("__c") - col("__c")).as("__ties"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val n = na + nb
    val u1 = (col("__r1x2") - col("n_a") * (col("n_a") + 1L))
      .cast("double") / 2.0
    val sig2 = na * nb / 12.0 *
      ((n + 1.0) - col("__ties").cast("double") / (n * (n - 1.0)))
    agg.select((kc ++ Seq(col("n_a"), col("n_b"), u1.as("u1"),
      when(col("n_a") > 0 && col("n_b") > 0 && sig2 > 0,
        (u1 - na * nb / 2.0) / sqrt(sig2)).as("z"))): _*)
  }

  /** CH `exponentialTimeDecayedSum(tau)` evaluated at each key's last
    * event: Σ value_j · exp(−(t_last − t_j)/τ). Times are epoch-nanos
    * longs; the difference is taken on longs FIRST (exact — spans fit
    * in a double's 2⁵³ mantissa; absolute epoch-ns do not) and only
    * then cast. One hash exchange: the max-window and the aggregation
    * share the key partitioning. Output: keys..., n_events, last
    * event time (epoch seconds), decayed_sum (unrounded). */
  def decayedSumAtLast(df: DataFrame, keys: Seq[String], timeNs: Column,
                       value: Column, tauNs: Long): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*)
    df.withColumn("__mx", max(timeNs).over(w))
      .groupBy(kc: _*)
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Fns.nanosToEpochSec(max(timeNs)).as("last_ts_s"),
        sum(value * exp((timeNs - col("__mx")).cast("double") / lit(tauNs.toDouble)))
          .as("decayed_sum"))
  }

  /** Spearman rank correlation (CH `rankCorr`) between x and y within
    * each group, EXACT under ties: each row's average rank is kept in
    * DOUBLED units (2·minrank + ties − 1, always an integer — the
    * [[mannWhitney]] trick per-row), and Pearson over the doubled
    * ranks equals Pearson over the true average ranks because
    * correlation is affine-invariant. Sufficient statistics run in
    * decimal(38,0) — integral and EXACT to ~3·10¹² rows per group
    * (the rank-product sums grow as 4n³, past int64 at n≈1.3·10⁶,
    * where a long sum would silently wrap under non-ANSI Spark;
    * DuckDB's HUGEINT promotion is the same fix) — and the
    * numerator/denominators n·Σxy−ΣxΣy are formed in decimal too
    * (4n⁴ < 10³⁸), because double-casting the near-equal terms first
    * loses the difference to cancellation; only the final ratio
    * finalizes in double.
    * Scale: two keyed sort windows + one keyed aggregation, all on
    * the SAME group key — one hash exchange, two in-partition sorts.
    * Output: keys..., n, rho (unrounded double; null when either
    * margin is constant). */
  def spearman(df: DataFrame, keys: Seq[String], x: Column, y: Column): DataFrame = {
    val kc = keys.map(col)
    def rank2(v: String): Column = {
      val ord = Window.partitionBy(kc: _*).orderBy(col(v))
      val ties = Window.partitionBy((kc :+ col(v)): _*)
      lit(2L) * rank().over(ord) + count(lit(1)).over(ties) - 1L
    }
    val agg = df.select((kc :+ x.as("__x") :+ y.as("__y")): _*)
      .withColumn("__rx", rank2("__x"))
      .withColumn("__ry", rank2("__y"))
      .groupBy(kc: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__rx").cast("decimal(38,0)")).as("__sx"),
        sum(col("__ry").cast("decimal(38,0)")).as("__sy"),
        sum(col("__rx").cast("decimal(19,0)") * col("__ry")).as("__sxy"),
        sum(col("__rx").cast("decimal(19,0)") * col("__rx")).as("__sxx"),
        sum(col("__ry").cast("decimal(19,0)") * col("__ry")).as("__syy"))
    val nD = col("n").cast("decimal(38,0)")
    val num = (nD * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val dx = (nD * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val dy = (nD * col("__syy") - col("__sy") * col("__sy")).cast("double")
    agg.select((kc :+ col("n") :+
      when(dx > 0 && dy > 0, num / sqrt(dx * dy)).as("rho")): _*)
  }

  /** Median absolute deviation — median(|x − median(x)|) per group,
    * both medians EXACT data elements under the b15 integer-rank
    * convention (lower median: rank (n−1)·50/100 + 1 over a
    * (value, tieBreak) total order). The deviations are one IEEE
    * subtraction of two data doubles — identical on any engine — so
    * the output needs NO rounding. Scale: median-by-rank is a keyed
    * sort window; the per-group median row (|groups| rows) joins back
    * broadcast; the deviation pass re-sorts once. Two corpus sorts,
    * no corpus-sized shuffle beyond them.
    * Output: keys..., n, median, mad. */
  def medianAbsDev(df: DataFrame, keys: Seq[String], value: Column,
                   tieBreak: Column): DataFrame = {
    val kc = keys.map(col)
    def medianRow(in: DataFrame, v: String): DataFrame = {
      val w = Window.partitionBy(kc: _*).orderBy(col(v), col("__tb"))
      val cw = Window.partitionBy(kc: _*)
      in.withColumn("__rn", row_number().over(w))
        .withColumn("__cnt", count(lit(1)).over(cw))
        .filter(col("__rn") === floor((col("__cnt") - 1L) * 50L / 100L) + 1L)
    }
    val base = df.select((kc :+ value.as("__v") :+ tieBreak.as("__tb")): _*)
    val med = medianRow(base, "__v")
      .select((kc :+ col("__cnt").as("n") :+ col("__v").as("median")): _*)
    // the deviation pass carries (n, median) through its window —
    // group constants — so the median branch is built exactly once
    val dev = base.join(broadcast(med), keys)
      .withColumn("__d", abs(col("__v") - col("median")))
    medianRow(dev, "__d")
      .select((kc ++ Seq(col("n"), col("median"), col("__d").as("mad"))): _*)
  }

  /** One-way ANOVA F statistic (CH `analysisOfVariance`): does the
    * mean of `value` differ across the `cat` levels within each
    * group? One pass of per-(group, cat) sufficient statistics — the
    * exchange carries (n, Σx, Σx²) per cell — then the between/within
    * decomposition finalizes over |cats| rows per group:
    * F = (SSB/(k−1)) / (SSW/(n−k)). Callers round (float sums).
    * Output: keys..., n, k, ssb, ssw, f (null when k < 2, n ≤ k, or
    * SSW is 0). */
  def anovaF(df: DataFrame, keys: Seq[String], cat: Column,
             value: Column): DataFrame = {
    val kc = keys.map(col)
    val cells = df.groupBy((kc :+ cat.as("__cat")): _*)
      .agg(count(lit(1)).as("__n"), sum(value).as("__s"),
        sum(value * value).as("__q"))
    val agg = cells.groupBy(kc: _*)
      .agg(sum(col("__n")).as("n"), count(lit(1)).as("k"),
        sum(col("__s")).as("__st"), sum(col("__q")).as("__qt"),
        sum(col("__s") * col("__s") / col("__n").cast("double")).as("__sg"))
    val n = col("n").cast("double")
    val k = col("k").cast("double")
    val ssb = col("__sg") - col("__st") * col("__st") / n
    val ssw = col("__qt") - col("__sg")
    agg.select((kc ++ Seq(col("n"), col("k"), ssb.as("ssb"), ssw.as("ssw"),
      when(col("k") >= 2 && col("n") > col("k") && ssw > 0,
        (ssb / (k - 1.0)) / (ssw / (n - k))).as("f"))): _*)
  }
}
