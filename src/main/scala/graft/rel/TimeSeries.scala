package graft.rel

import graft.{QueryModule, Tables}
import graft.functions.PortableRound.pround
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the event stream: calendar gap-fill (dense
  * daily series with zero-filled missing days) and last-observation-carried-
  * forward. The reference's dashboards are daily series built from the CTAS
  * tables (`dag/wiki_pipeline_dag.py:29-39`); days with no edits simply
  * vanish from those charts — gap-fill is the first fix any analytics user
  * applies on top.
  *
  * Scale notes (100 TB):
  *  - The calendar spine is `sequence(min, max, 1 day)` exploded from ONE
  *    aggregated row, then cross-joined with the (tiny, distinct) key dim —
  *    spine size = days × keys, independent of fact cardinality. The fact
  *    side arrives pre-aggregated per (day, key), so the fill join is
  *    dim-sized, broadcastable.
  *  - Forward-fill is one shuffle on the partition key + a linear
  *    `last(ignoreNulls)` running window — same scalable shape as the as-of
  *    join (`Joins.joinAsof`); no self-join, no point lookups.
  */
object TimeSeries extends QueryModule {

  /** Dense daily (day × event_type) counts with zero-filled gaps. */
  private def tsGapfill(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val counts = e.groupBy(to_date($"ts").as("d"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val spine = e.agg(to_date(min($"ts")).as("lo"), to_date(max($"ts")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
      .crossJoin(e.select($"event_type").distinct())
    spine.join(counts, Seq("d", "event_type"), "left_outer")
      .select($"d", $"event_type", coalesce($"n", lit(0L)).as("n"))
      .orderBy($"d", $"event_type")
  }

  /** Last-observation-carried-forward: for every event, the most recent
    * purchase value of the same user at-or-before it (null until the user's
    * first purchase). */
  private def tsFillForward(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("pv", when($"event_type" === "purchase", $"value"))
      .withColumn("fwd", pround(last($"pv", ignoreNulls = true).over(w), 4))
      .select($"event_id", $"user_id", $"fwd")
      .orderBy($"event_id")
  }

  /** Fixed-interval downsampling (resample to 6-hour buckets): the
    * standard metric-store reduction from raw events to a coarse series.
    * `window(ts, "6 hours")` assigns buckets in a single codegen'd
    * projection (epoch-aligned; 6 h divides a day, so boundaries equal
    * DuckDB's `time_bucket`), then one partial+final hash aggregate —
    * shuffle carries one row per (bucket, type), never raw events. */
  private def tsResample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(window($"ts", "6 hours").getField("start").as("bucket"),
        $"event_type")
      .agg(count(lit(1)).as("n"),
        pround(avg($"value"), 4).as("avg_value"),
        pround(max($"value"), 4).as("max_value"))
      .orderBy($"bucket", $"event_type")
  }

  /** 7-day rolling DISTINCT user count per day — the WAU (weekly-active)
    * metric. Window functions cannot COUNT DISTINCT over a frame, and a
    * per-day self-join re-scans the facts 7x; the scalable form is
    * EXPLODE-INTO-COVERED-WINDOWS: dedup to (user, day) rows (one exact
    * shuffle — the relation is bounded by users×days, far smaller than
    * events), map-side explode each row into the ≤7 window-end days it
    * covers, then one count-distinct per window day. Facts are scanned
    * once; everything else is proportional to the distinct relation. */
  private def tsRollingDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val userDays = e.select(to_date($"ts").as("d"), $"user_id").distinct()
    val observedDays = e.select(to_date($"ts").as("wd")).distinct()
    userDays
      .select(explode(sequence($"d", date_add($"d", 6))).as("wd"), $"user_id")
      .join(observedDays, Seq("wd"))
      .groupBy($"wd")
      .agg(countDistinct($"user_id").as("wau"))
      .orderBy($"wd")
  }

  /** The sub-linear-state twin of [[tsRollingDistinct]]: HLL++ sketch
    * instead of exact distinct. At 100 TB the exact form's count-distinct
    * shuffle carries every (window-day, user) pair; the sketch partials
    * combine map-side to a few KB per day regardless of user cardinality.
    * Rows-only (sketch estimates are engine-specific); PropertySpec bounds
    * the error against the exact query. */
  private def tsRollingDistinctApprox(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val userDays = e.select(to_date($"ts").as("d"), $"user_id").distinct()
    val observedDays = e.select(to_date($"ts").as("wd")).distinct()
    userDays
      .select(explode(sequence($"d", date_add($"d", 6))).as("wd"), $"user_id")
      .join(observedDays, Seq("wd"))
      .groupBy($"wd")
      .agg(approx_count_distinct($"user_id", 0.02).as("wau_approx"))
      .orderBy($"wd")
  }

  override def queries: Map[String, QueryFn] = Map(
    "ts_gapfill"          -> tsGapfill,
    "ts_fill_forward"     -> tsFillForward,
    "ts_resample"         -> tsResample,
    "ts_rolling_distinct" -> tsRollingDistinct,
    "ts_rolling_distinct_approx" -> tsRollingDistinctApprox
  )

  override def oracles: Map[String, String] = Map(
    "ts_gapfill" ->
      """WITH counts AS (
        |  SELECT CAST(ts AS DATE) AS d, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT unnest(generate_series(CAST(min(ts) AS DATE),
        |                                CAST(max(ts) AS DATE),
        |                                INTERVAL 1 DAY))::DATE AS d
        |  FROM events),
        |keys AS (SELECT DISTINCT event_type FROM events)
        |SELECT s.d, k.event_type, coalesce(c.n, 0) AS n
        |FROM spine s CROSS JOIN keys k
        |LEFT JOIN counts c ON c.d = s.d AND c.event_type = k.event_type
        |ORDER BY s.d, k.event_type""".stripMargin,
    "ts_fill_forward" ->
      """SELECT event_id, user_id,
        |  floor(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1e4 + 0.5) / 1e4
        |    AS fwd
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "ts_resample" ->
      """SELECT time_bucket(INTERVAL '6 hours', ts) AS bucket, event_type,
        |  count(*) AS n,
        |  floor(avg(value) * 1e4 + 0.5) / 1e4 AS avg_value,
        |  floor(max(value) * 1e4 + 0.5) / 1e4 AS max_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket, event_type""".stripMargin,
    "ts_rolling_distinct" ->
      """WITH ud AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |days AS (SELECT DISTINCT CAST(ts AS DATE) AS wd FROM events),
        |cov AS (
        |  SELECT unnest(generate_series(d, d + INTERVAL 6 DAY,
        |                                INTERVAL 1 DAY))::DATE AS wd, user_id
        |  FROM ud)
        |SELECT c.wd, count(DISTINCT user_id) AS wau
        |FROM cov c JOIN days USING (wd)
        |GROUP BY 1 ORDER BY wd""".stripMargin
  )
}
