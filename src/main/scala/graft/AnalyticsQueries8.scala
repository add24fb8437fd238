package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.sources.Tables

/** B-series round 6: growth accounting — the standard product-
  * analytics decomposition of daily actives into new / retained /
  * resurrected (plus yesterday's churn), the report b13 retention,
  * b42 cohorts, and b92 stickiness orbit without stating directly.
  *
  * Scale notes (graded): the corpus collapses to distinct (user, day)
  * FIRST — one data exchange — and every classification is a lag over
  * that collapsed table's user-keyed sort; the daily summary and its
  * churn lag run over the |days| rollup. Raw events never cross more
  * than once, same contract as b80/b92. */
object AnalyticsQueries8 {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** B93: growth accounting. Per day: users active for the first time
    * ever (new), active yesterday too (retained), returning after a
    * gap ≥ 2 days (resurrected), and yesterday's actives who did not
    * return (churned = dau(prev day) − retained(today), null on the
    * first observed day — classic DAU growth accounting, e.g. the
    * Social Capital framework). dau ≡ new + retained + resurrected by
    * construction. */
  private def b93GrowthAccounting(s: SparkSession, dir: String): DataFrame = {
    val ud = T(s, dir, "events")
      .select(to_date(Fns.nanosToTimestamp(col("ts"))).as("d"), col("user_id"))
      .distinct()
    val lagW = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val classified = ud
      .withColumn("prev", lag(col("d"), 1).over(lagW))
      .withColumn("status",
        when(col("prev").isNull, "new")
          .when(datediff(col("d"), col("prev")) === 1, "retained")
          .otherwise("resurrected"))
    val daily = classified.groupBy(col("d"))
      .agg(
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"),
        count(lit(1)).as("dau"))
    val dayW = Window.partitionBy().orderBy(col("d"))
    daily
      .withColumn("prev_dau", lag(col("dau"), 1).over(dayW))
      .withColumn("prev_d", lag(col("d"), 1).over(dayW))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n_new"), col("n_retained"), col("n_resurrected"), col("dau"),
        // churn only defined against an ADJACENT previous day
        when(col("prev_dau").isNotNull && datediff(col("d"), col("prev_d")) === 1,
          col("prev_dau") - col("n_retained")).as("n_churned"))
      .orderBy(col("day"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b93_growth_accounting" -> (b93GrowthAccounting _)
  )

  def oracleSql: Map[String, String] = Map(
    "b93_growth_accounting" ->
      """WITH ud AS (
           SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
         cl AS (
           SELECT d, user_id,
             lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev
           FROM ud),
         st AS (
           SELECT d,
             CASE WHEN prev IS NULL THEN 'new'
                  WHEN date_diff('day', prev, d) = 1 THEN 'retained'
                  ELSE 'resurrected' END AS status
           FROM cl),
         daily AS (
           SELECT d,
             CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
             CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
             count(*) AS dau
           FROM st GROUP BY d),
         lagged AS (
           SELECT *, lag(dau) OVER (ORDER BY d) AS prev_dau,
             lag(d) OVER (ORDER BY d) AS prev_d
           FROM daily)
         SELECT strftime(d, '%Y-%m-%d') AS day,
           n_new, n_retained, n_resurrected, dau,
           CASE WHEN prev_dau IS NOT NULL AND date_diff('day', prev_d, d) = 1
             THEN prev_dau - n_retained END AS n_churned
         FROM lagged ORDER BY day"""
  )
}
