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


  /** B94: seasonality profile — the (day-of-week × hour) activity
    * matrix (the "when do our users show up" heatmap): events and
    * share-of-total in exact ppm plus decimal-exact mean value per
    * cell. Both axes are pure integer arithmetic over epoch-nanos
    * (1970-01-01 was a Thursday → dow = (epoch_day + 4) mod 7,
    * 0 = Sunday) so cell edges are engine-exact — no timezone or
    * date-function semantics involved. One map-side-combined
    * aggregation; the share window runs over 168 cells. */
  private def b94DowProfile(s: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val hourNs = 3600L * 1000000000L
    val cells = T(s, dir, "events")
      .select(
        pmod(Fns.floorDivLong(col("ts"), dayNs) + 4L, lit(7L)).as("dow"),
        pmod(Fns.floorDivLong(col("ts"), hourNs), lit(24L)).as("hour"),
        col("value"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("__sv"))
    cells
      .withColumn("__total", sum(col("n_events")).over(Window.partitionBy()))
      .select(col("dow"), col("hour"), col("n_events"),
        expr("n_events * 1000000 div __total").as("share_ppm"),
        round(col("__sv").cast("double") / col("n_events").cast("double"), 4)
          .as("mean_value"))
      .orderBy(col("dow"), col("hour"))
  }

  /** B95: lead/lag cross-correlation — Pearson correlation of two
    * event types' daily-count series at day offsets −3…3 ("do clicks
    * lead purchases?"). The corpus collapses to one |days| rollup per
    * type; every lag correlates over the INNER join of shifted day
    * axes (so each lag's n is explicit), sums in integers, one final
    * closed form per lag. */
  private def b95LagCorr(s: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val daily = T(s, dir, "events")
      .select(Fns.floorDivLong(col("ts"), dayNs).as("day"), col("event_type"))
      .groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("n"))
    val a = daily.filter(col("event_type") === "click")
      .select(col("day"), col("n").as("na"))
    val b = daily.filter(col("event_type") === "purchase")
      .select(col("day"), col("n").as("nb"))
    val joined = a.select(col("day"), col("na"),
        explode(sequence(lit(-3L), lit(3L))).as("lag"))
      .withColumn("bday", col("day") + col("lag"))
      .join(b.withColumnRenamed("day", "bday"), Seq("bday"))
    joined.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("na")).as("sa"), sum(col("nb")).as("sb"),
        sum(col("na") * col("nb")).as("sab"),
        sum(col("na") * col("na")).as("saa"),
        sum(col("nb") * col("nb")).as("sbb"))
      .select(col("lag"), col("n"),
        round(
          (col("n") * col("sab") - col("sa") * col("sb")).cast("double") /
            (sqrt((col("n") * col("saa") - col("sa") * col("sa")).cast("double")) *
             sqrt((col("n") * col("sbb") - col("sb") * col("sb")).cast("double"))),
          6).as("corr"))
      .orderBy(col("lag"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b93_growth_accounting" -> (b93GrowthAccounting _),
    "b94_dow_profile" -> (b94DowProfile _),
    "b95_lag_corr" -> (b95LagCorr _)
  )

  def oracleSql: Map[String, String] = Map(
    "b94_dow_profile" ->
      """WITH cells AS (
           SELECT (epoch_ns(ts) // 86400000000000 + 4) % 7 AS dow,
             (epoch_ns(ts) // 3600000000000) % 24 AS hour,
             count(*) AS n_events,
             sum(CAST(value AS DECIMAL(18,2))) AS sv
           FROM events GROUP BY 1, 2)
         SELECT dow, hour, n_events,
           CAST(n_events * 1000000 // CAST((SELECT sum(n_events) FROM cells) AS BIGINT) AS BIGINT) AS share_ppm,
           round(CAST(sv AS DOUBLE) / n_events, 4) AS mean_value
         FROM cells ORDER BY dow, hour""",
    "b95_lag_corr" ->
      """WITH daily AS (
           SELECT epoch_ns(ts) // 86400000000000 AS day, event_type,
             count(*) AS n
           FROM events GROUP BY 1, 2),
         a AS (SELECT day, n AS na FROM daily WHERE event_type = 'click'),
         b AS (SELECT day, n AS nb FROM daily WHERE event_type = 'purchase'),
         j AS (
           SELECT l.lag AS lag, a.na, b.nb
           FROM a CROSS JOIN (SELECT unnest(generate_series(-3, 3)) AS lag) l
           JOIN b ON b.day = a.day + l.lag),
         g AS (
           SELECT lag, count(*) AS n,
             CAST(sum(na) AS BIGINT) AS sa, CAST(sum(nb) AS BIGINT) AS sb,
             CAST(sum(na * nb) AS BIGINT) AS sab,
             CAST(sum(na * na) AS BIGINT) AS saa,
             CAST(sum(nb * nb) AS BIGINT) AS sbb
           FROM j GROUP BY lag)
         SELECT lag, n,
           round(CAST(n * sab - sa * sb AS DOUBLE) /
             (sqrt(CAST(n * saa - sa * sa AS DOUBLE)) *
              sqrt(CAST(n * sbb - sb * sb AS DOUBLE))), 6) AS corr
         FROM g ORDER BY lag""",
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
