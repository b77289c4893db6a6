package graft.agg

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's flagship analytics: daily top-titles / top-editors
  * aggregations over the curated event table, plus the dashboard-side global
  * gauge and per-group sums.
  *
  * Reference evidence: daily_top_titles CTAS (`dag/wiki_pipeline_dag.py:29-39`),
  * top-editors extract (`upsert_athena_aggregates.py:39-50`), QuickSight
  * gauge/bars (dashboards 1-3). The driver's `events` table plays `curated`
  * (`ts` ↔ event time, `event_type` ↔ title, `user_id` ↔ user — FIXTURES.md).
  *
  * Scale notes (100 TB): these are hash aggregates over (day, key) — Spark
  * plans partial (map-side) + final aggregation automatically, so the shuffle
  * carries pre-combined (ds,title,editor,count) tuples, not raw events. The
  * real-data skew the dashboards show (top title 22,724 vs "Other" 941,690 —
  * BASELINE.md) is absorbed by the partial agg: hot keys are combined within
  * every map partition before the shuffle. AQE (on by default) additionally
  * splits skewed reducers.
  */
object DailyAggregates extends QueryModule {

  /** A1 — the flagship: GROUP BY (day, title, editor) → count, mirroring
    * `dag/wiki_pipeline_dag.py:31-38` / `README.md:101-104`.
    */
  def dailyTopTitles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(
        to_date($"ts").as("ds"),
        $"event_type".as("title"),
        $"user_id".as("editor"))
      .agg(count(lit(1)).as("edits"))
      .orderBy($"edits".desc, $"ds", $"title", $"editor")
  }

  /** Funnel conversion — the product-analytics staple over the event
    * stream: per user, the first signup and the first purchase at-or-after
    * it, with a 72 h conversion verdict. Two conditional aggregations on
    * the user key (signup firsts; purchase firsts gated on the signup
    * time) — the signup frame re-joins by user, so the whole funnel is
    * user-key-partitioned with no window over raw events and no
    * event-to-event pair join. The reference dashboards count page events;
    * this is the next dashboard every product team asks for. */
  private def funnelConversion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val signups = e.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("signup_ts"))
    val firstPurchase = e.filter($"event_type" === "purchase")
      .join(signups, Seq("user_id"))
      .filter($"ts" >= $"signup_ts")
      .groupBy($"user_id").agg(min($"ts").as("purchase_ts"))
    signups.join(firstPurchase, Seq("user_id"), "left")
      .select($"user_id", $"signup_ts", $"purchase_ts",
        ($"purchase_ts".isNotNull &&
          $"purchase_ts" <= $"signup_ts" + expr("INTERVAL 72 HOURS"))
          .as("converted"))
      .orderBy($"user_id")
  }

  /** Cohort retention matrix — users grouped by first-active day, counted
    * per day-offset of later activity: THE retention dashboard. One
    * distinct (user, day) projection feeds both the cohort assignment
    * (min-day aggregate on the user key) and the activity join; the matrix
    * aggregate is (cohort_day, offset)-keyed — day-cardinality², tiny at
    * any event volume, and every shuffle key is the user id until the
    * final matrix reduction. */
  private def retentionCohort(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ud = Tables.events(spark, sfDir)
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val cohorts = ud.groupBy($"user_id").agg(min($"d").as("cohort_day"))
    ud.join(cohorts, Seq("user_id"))
      .groupBy($"cohort_day",
        datediff($"d", $"cohort_day").cast("long").as("day_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_day", $"day_offset")
  }

  override def queries: Map[String, QueryFn] = Map(
    "agg_daily_top_titles" -> dailyTopTitles,
    "funnel_conversion"    -> funnelConversion,
    "agg_retention_cohort" -> retentionCohort
  )

  override def oracles: Map[String, String] = Map(
    "agg_daily_top_titles" ->
      """SELECT CAST(ts AS DATE) AS ds, event_type AS title, user_id AS editor,
        |       count(*) AS edits
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY edits DESC, ds, title, editor""".stripMargin,
    "funnel_conversion" ->
      """WITH s AS (
        |  SELECT user_id, min(ts) AS signup_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS purchase_ts
        |  FROM events e JOIN s USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
        |  GROUP BY e.user_id)
        |SELECT s.user_id, s.signup_ts, p.purchase_ts,
        |       p.purchase_ts IS NOT NULL
        |         AND p.purchase_ts <= s.signup_ts + INTERVAL 72 HOUR
        |         AS converted
        |FROM s LEFT JOIN p USING (user_id)
        |ORDER BY s.user_id""".stripMargin,
    "agg_retention_cohort" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, min(d) AS cohort_day FROM ud GROUP BY user_id)
        |SELECT c.cohort_day, datediff('day', c.cohort_day, ud.d) AS day_offset,
        |       count(DISTINCT ud.user_id) AS n_users
        |FROM ud JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
