package graft.rel

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorts / limits / top-K (SURVEY.md §2.6) + set operations (§2.7).
  *
  * Reference evidence: `ORDER BY edits DESC LIMIT 20` (`README.md:105-106`),
  * QuickSight "top N + Other" bucketing (dashboard 2: top-25 titles with an
  * `Other 941,690` bucket), union of per-day CTAS tables into the dashboard
  * view (`dag/wiki_pipeline_dag.py:30` naming).
  *
  * Scale notes (100 TB): `orderBy(...).limit(k)` compiles to
  * `TakeOrderedAndProject` — each task keeps a k-row heap, the driver merges
  * per-task heaps; no global sort ever materializes. The "Other" bucket is a
  * rank-then-relabel over an already-aggregated frame (small), then one
  * re-aggregation. Set ops are shuffle-distinct — fine on key columns;
  * `union all` is metadata-only.
  */
object SortSet extends QueryModule {

  /** O1 — top-K via ORDER BY ... LIMIT (TakeOrderedAndProject). */
  private def topkOrderbyLimit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("d"), $"event_type".as("title"))
      .agg(count(lit(1)).as("edits"))
      .orderBy($"edits".desc, $"d".asc, $"title".asc)
      .limit(20)
  }

  /** O4 — top-N per category with an "Other" bucket (dashboard 2 shape). */
  private def topkOtherBucket(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Top-10 via orderBy+limit (TakeOrderedAndProject: per-partition heaps,
    // no global sort) + broadcast membership join — NOT a global-window
    // row_number, which would single-partition every group row. At 100 TB
    // the group counts stay distributed and only K rows ever centralize.
    // Materialize.once: `counts` feeds both the top-K probe and the re-agg —
    // materialize the grouped frame once instead of scanning+shuffling the
    // fact table twice (lineage kept for recompute-on-loss).
    val counts = Materialize.once(Tables.events(spark, sfDir)
      .groupBy($"event_type", $"user_id")
      .agg(count(lit(1)).as("n")))
    val top = counts
      .orderBy($"n".desc, $"event_type".asc, $"user_id".asc)
      .limit(10)
      .select($"event_type".as("t_type"), $"user_id".as("t_user"))
    counts
      .join(broadcast(top),
        $"event_type" === $"t_type" && $"user_id" === $"t_user", "left_outer")
      .withColumn("label",
        when($"t_type".isNotNull, concat_ws(":", $"event_type", $"user_id"))
          .otherwise(lit("Other")))
      .groupBy($"label")
      .agg(sum($"n").as("edits"))
      .orderBy($"edits".desc, $"label".asc)
  }

  /** O3 — multi-column sort with explicit null ordering. */
  private def sortMulti(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_shipdate")
      .orderBy(
        $"l_returnflag".asc_nulls_last,
        $"l_shipdate".desc_nulls_last,
        $"l_orderkey".asc,
        $"l_linenumber".asc)
  }

  /** U1/U3 — union of per-day aggregate slices (the `vw_top_titles_by_day`
    * reconstruction: per-day tables unioned into one view). */
  private def setUnionDaily(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def daySlice(day: String): DataFrame =
      Tables.events(spark, sfDir)
        .filter(to_date($"ts") === lit(day).cast("date"))
        .groupBy(to_date($"ts").as("ds"), $"event_type".as("title"))
        .agg(count(lit(1)).as("edits"))
    daySlice("2024-01-02")
      .unionByName(daySlice("2024-01-03"))
      .orderBy($"ds", $"title")
  }

  /** U2a — intersect (distinct semantics). */
  private def setIntersect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    e.filter($"event_type" === "purchase").select($"user_id")
      .intersect(e.filter($"event_type" === "signup").select($"user_id"))
      .orderBy($"user_id")
  }

  /** U2b — except (distinct semantics): (user, day) slots with a click but
    * no purchase. */
  private def setExcept(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    e.filter($"event_type" === "click")
      .select($"user_id", to_date($"ts").as("d"))
      .except(
        e.filter($"event_type" === "purchase")
          .select($"user_id", to_date($"ts").as("d")))
      .orderBy($"user_id", $"d")
  }

  /** U2c — INTERSECT ALL (bag semantics): per-user purchase days seen on
    * BOTH halves of a date split keep their multiplicity — the count of a
    * value in the result is min(count left, count right), which Spark
    * plans as a single aggregate-join, not a distinct. */
  private def setIntersectAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir).filter($"event_type" === "purchase")
    e.filter(dayofmonth($"ts") <= 20)
      .select($"user_id", dayofweek($"ts").cast("long").as("dw"))
      .intersectAll(
        e.filter(dayofmonth($"ts") >= 10)
          .select($"user_id", dayofweek($"ts").cast("long").as("dw")))
      .orderBy($"user_id", $"dw")
  }

  /** U2d — EXCEPT ALL (bag semantics): multiplicity max(l - r, 0) per
    * value. */
  private def setExceptAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    e.filter($"event_type" === "click").select($"user_id", dayofweek($"ts").cast("long").as("dw"))
      .exceptAll(
        e.filter($"event_type" === "purchase")
          .select($"user_id", dayofweek($"ts").cast("long").as("dw")))
      .orderBy($"user_id", $"dw")
  }

  override def queries: Map[String, QueryFn] = Map(
    "topk_orderby_limit" -> topkOrderbyLimit,
    "topk_other_bucket"  -> topkOtherBucket,
    "sort_multi"         -> sortMulti,
    "set_union_daily"    -> setUnionDaily,
    "set_intersect"      -> setIntersect,
    "set_except"         -> setExcept,
    "set_intersect_all"  -> setIntersectAll,
    "set_except_all"     -> setExceptAll
  )

  override def oracles: Map[String, String] = Map(
    "topk_orderby_limit" ->
      """SELECT CAST(ts AS DATE) AS d, event_type AS title, count(*) AS edits
        |FROM events GROUP BY 1, 2
        |ORDER BY edits DESC, d ASC, title ASC LIMIT 20""".stripMargin,
    "topk_other_bucket" ->
      """SELECT label, CAST(sum(n) AS BIGINT) AS edits FROM (
        |  SELECT CASE WHEN rn <= 10 THEN concat_ws(':', event_type, user_id)
        |              ELSE 'Other' END AS label, n
        |  FROM (SELECT event_type, user_id, n,
        |               row_number() OVER (ORDER BY n DESC, event_type ASC, user_id ASC) AS rn
        |        FROM (SELECT event_type, user_id, count(*) AS n
        |              FROM events GROUP BY 1, 2)))
        |GROUP BY label ORDER BY edits DESC, label ASC""".stripMargin,
    "sort_multi" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate FROM lineitem
        |ORDER BY l_returnflag ASC NULLS LAST, l_shipdate DESC NULLS LAST,
        |         l_orderkey ASC, l_linenumber ASC""".stripMargin,
    "set_union_daily" ->
      """SELECT * FROM (
        |  SELECT CAST(ts AS DATE) AS ds, event_type AS title, count(*) AS edits
        |  FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-02' GROUP BY 1, 2
        |  UNION ALL
        |  SELECT CAST(ts AS DATE) AS ds, event_type AS title, count(*) AS edits
        |  FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-03' GROUP BY 1, 2)
        |ORDER BY ds, title""".stripMargin,
    "set_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'signup'
        |ORDER BY user_id""".stripMargin,
    "set_except" ->
      """SELECT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, d""".stripMargin,
    "set_intersect_all" ->
      """SELECT user_id, dayofweek(ts) + 1 AS dw FROM events
        |WHERE event_type = 'purchase' AND dayofmonth(ts) <= 20
        |INTERSECT ALL
        |SELECT user_id, dayofweek(ts) + 1 AS dw FROM events
        |WHERE event_type = 'purchase' AND dayofmonth(ts) >= 10
        |ORDER BY user_id, dw""".stripMargin,
    "set_except_all" ->
      """SELECT user_id, dayofweek(ts) + 1 AS dw FROM events WHERE event_type = 'click'
        |EXCEPT ALL
        |SELECT user_id, dayofweek(ts) + 1 AS dw FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, dw""".stripMargin
  )
}
