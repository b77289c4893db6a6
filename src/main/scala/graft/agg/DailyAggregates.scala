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

  override def queries: Map[String, QueryFn] = Map(
    "agg_daily_top_titles" -> dailyTopTitles
  )

  override def oracles: Map[String, String] = Map(
    "agg_daily_top_titles" ->
      """SELECT CAST(ts AS DATE) AS ds, event_type AS title, user_id AS editor,
        |       count(*) AS edits
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY edits DESC, ds, title, editor""".stripMargin
  )
}
