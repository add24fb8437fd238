package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.operators.Stats
import graft.sources.Tables

/** B-series round 5, final statistical batch (SURVEY §2B, B74-B76):
  * Spearman rank correlation (`rankCorr`), median absolute deviation
  * (the robust-dispersion companion to b15's quantiles), and one-way
  * ANOVA (`analysisOfVariance`) — completing the correlation
  * (b63 Pearson matrix), dispersion (b15/b52/b60), and hypothesis-test
  * (b58 t / b62 KS / b64 MWU) families.
  *
  * Scale notes (graded): b74's two rank windows and its aggregation
  * share one event_type hash exchange; b75 is two keyed sorts with a
  * broadcast median join-back (the per-group median table is |groups|
  * rows); b76's exchange carries (n, Σx, Σx²) per (day, type) cell —
  * map-side combine, finalization over |types| rows per day.
  */
object AnalyticsQueries7 {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** B74: CH `rankCorr` — Spearman ρ between `value` and event time
    * per event type ("does the metric trend over the corpus
    * window?"). Tie-exact via doubled average ranks (integers all the
    * way to the final ρ). */
  private def b74RankCorr(s: SparkSession, dir: String): DataFrame =
    Stats.spearman(
        T(s, dir, "events").select(col("event_type"), col("ts"), col("value")),
        Seq("event_type"), col("value"), col("ts"))
      .select(col("event_type"), col("n"), round(col("rho"), 4).as("rho"))
      .orderBy(col("event_type"))

  /** B75: median absolute deviation of `value` per event type — the
    * outlier-robust dispersion number next to b15's quantiles. Both
    * medians are exact data elements (b15's integer-rank convention,
    * (value, event_id) total order), and |x − med| is one IEEE
    * subtraction, so the output compares exactly with NO rounding. */
  private def b75Mad(s: SparkSession, dir: String): DataFrame =
    Stats.medianAbsDev(
        T(s, dir, "events").select(col("event_type"), col("event_id"),
          col("value")),
        Seq("event_type"), col("value"), col("event_id"))
      .orderBy(col("event_type"))

  /** B76: CH `analysisOfVariance` — per day, does mean `value` differ
    * across event types? The daily F statistic next to the pairwise
    * tests (b58/b62/b64 compare two cohorts; ANOVA compares all k at
    * once). */
  private def b76Anova(s: SparkSession, dir: String): DataFrame =
    Stats.anovaF(
        T(s, dir, "events").select(
          date_format(Fns.nanosToTimestamp(col("ts")), "yyyy-MM-dd")
            .as("event_date"),
          col("event_type"), col("value")),
        Seq("event_date"), col("event_type"), col("value"))
      .select(col("event_date"), col("n"), col("k"),
        round(col("ssb"), 2).as("ssb"), round(col("ssw"), 2).as("ssw"),
        round(col("f"), 4).as("f_stat"))
      .orderBy(col("event_date"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b74_rank_corr" -> (b74RankCorr _),
    "b75_mad" -> (b75Mad _),
    "b76_anova" -> (b76Anova _)
  )

  def oracleSql: Map[String, String] = Map(
    "b74_rank_corr" ->
      """WITH r AS (
           SELECT event_type,
             2 * rank() OVER (PARTITION BY event_type ORDER BY value)
               + count(*) OVER (PARTITION BY event_type, value) - 1 AS rx,
             2 * rank() OVER (PARTITION BY event_type ORDER BY epoch_ns(ts))
               + count(*) OVER (PARTITION BY event_type, epoch_ns(ts)) - 1
               AS ry
           FROM events),
         a AS (
           SELECT event_type, count(*) AS n,
             CAST(sum(rx) AS DOUBLE) AS sx, CAST(sum(ry) AS DOUBLE) AS sy,
             CAST(sum(rx * ry) AS DOUBLE) AS sxy,
             CAST(sum(rx * rx) AS DOUBLE) AS sxx,
             CAST(sum(ry * ry) AS DOUBLE) AS syy
           FROM r GROUP BY event_type)
         SELECT event_type, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
             THEN round((n * sxy - sx * sy)
               / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4)
             END AS rho
         FROM a ORDER BY event_type""",
    "b75_mad" ->
      """WITH v AS (
           SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
               ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS cnt
           FROM events),
         med AS (
           SELECT event_type, cnt AS n, value AS median FROM v
           WHERE rn = (cnt - 1) * 50 // 100 + 1),
         d AS (
           SELECT e.event_type, abs(e.value - med.median) AS dv,
             row_number() OVER (PARTITION BY e.event_type
               ORDER BY abs(e.value - med.median), e.event_id) AS rn,
             count(*) OVER (PARTITION BY e.event_type) AS cnt
           FROM events e JOIN med ON e.event_type = med.event_type)
         SELECT d.event_type, med.n, med.median, d.dv AS mad
         FROM d JOIN med ON d.event_type = med.event_type
         WHERE d.rn = (d.cnt - 1) * 50 // 100 + 1
         ORDER BY d.event_type""",
    "b76_anova" ->
      """WITH cells AS (
           SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type,
             count(*) AS n, sum(value) AS s, sum(value * value) AS q
           FROM events GROUP BY 1, 2),
         a AS (
           SELECT event_date, CAST(sum(n) AS BIGINT) AS n,
             count(*) AS k, sum(s) AS st, sum(q) AS qt,
             sum(s * s / n) AS sg
           FROM cells GROUP BY event_date),
         f AS (
           SELECT event_date, n, k,
             sg - st * st / n AS ssb, qt - sg AS ssw
           FROM a)
         SELECT event_date, n, k, round(ssb, 2) AS ssb,
           round(ssw, 2) AS ssw,
           CASE WHEN k >= 2 AND n > k AND ssw > 0
             THEN round((ssb / (k - 1)) / (ssw / (n - k)), 4) END AS f_stat
         FROM f ORDER BY event_date"""
  )
}
