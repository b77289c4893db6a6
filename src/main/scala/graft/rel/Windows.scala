package graft.rel

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.pround

/** Window-function surface (SURVEY.md §2.5) + the batch-expressible
  * streaming twins (tumbling day, gap-based sessions — §2.9 T2/T6).
  *
  * The reference's dashboards do "top 50 in title / top 27 in user"
  * QuickSight-side; W1 reproduces that ranking in-engine.
  *
  * Scale notes (100 TB): every window here partitions by a key (day / user)
  * before ordering, so Spark shuffles once on the partition key and sorts
  * within partitions — no global sort. The one exception, the daily-series
  * windows (lag / moving avg), order an already-aggregated frame of ~365
  * rows/year — single-partition is correct there because the input is tiny
  * BY CONSTRUCTION (post-aggregation), not because we assume small data.
  * Sessionization is the lag+cumsum linear formulation: one shuffle+sort per
  * user partition, O(n) after.
  */
object Windows extends QueryModule {

  /** Daily counts per event_type — shared base for ranking windows. */
  private def dailyTypeCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("d"), $"event_type")
      .agg(count(lit(1)).as("n"))
  }

  /** Daily total counts — shared base for series windows. */
  private def dailyTotals(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("d"))
      .agg(count(lit(1)).as("n"))
  }

  /** W1 — ranking: top-3 event types per day (the dashboard top-N). */
  private def rankTopN(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"d").orderBy($"n".desc, $"event_type".asc)
    dailyTypeCounts(spark, sfDir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"d", $"rn", $"event_type", $"n")
      .orderBy($"d", $"rn")
  }

  /** W2 — analytic lag: day-over-day delta of edit counts. */
  private def lagDelta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"d")
    dailyTotals(spark, sfDir)
      .withColumn("delta", $"n" - lag($"n", 1).over(w))
      .orderBy($"d")
  }

  /** W3 — row frame: 7-day trailing moving average. */
  private def movingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"d").rowsBetween(-6, Window.currentRow)
    dailyTotals(spark, sfDir)
      .withColumn("ma7", pround(avg($"n").over(w), 2))
      .orderBy($"d")
  }

  /** W4 — range frame over numeric event-time: per-user trailing-hour sum.
    * The frame is on epoch-µs so range arithmetic is exact integer math in
    * both engines. */
  private def rangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us")
      .rangeBetween(-3600000000L, 0)
    Tables.events(spark, sfDir)
      .withColumn("us", unix_micros($"ts".cast("timestamp")))
      .withColumn("rsum", pround(sum($"value").over(w), 2))
      .select($"event_id", $"rsum")
      .orderBy($"event_id")
  }

  /** W5 — ntile / percent_rank, GLOBAL ordering — computed via the
    * distributed two-phase rank ([[ScalableRank]]) rather than a
    * no-partition window, which would move every `orders` row (billions at
    * 100 TB) onto one task. Same results: the sort key carries a unique
    * tiebreaker, so rank == row_number and both functions have closed
    * forms from (rn, n). */
  private def ntileQ(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import ScalableRank._
    val ranked = withGlobalRowNumber(
      Tables.orders(spark, sfDir).select($"o_orderkey", $"o_totalprice"),
      "rn", "n", $"o_totalprice".asc, $"o_orderkey".asc)
    ranked
      .withColumn("tile", ntileFromRowNumber($"rn", $"n", 4).cast("long"))
      .withColumn("pr", pround(percentRankFromRowNumber($"rn", $"n"), 6))
      .select($"o_orderkey", $"tile", $"pr")
      .orderBy($"o_orderkey")
  }

  /** W5b — percent_rank / cume_dist PARTITIONED by event_type: the
    * distribution-rank surface in its scale-native form (one shuffle on the
    * partition key, per-group sort). The tie-free (value, event_id) order
    * makes both functions deterministic across engines. */
  private def percentRankQ(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"value".asc, $"event_id".asc)
    Tables.events(spark, sfDir)
      .withColumn("pr", pround(percent_rank().over(w), 6))
      .withColumn("cd", pround(cume_dist().over(w), 6))
      .select($"event_id", $"event_type", $"pr", $"cd")
      .orderBy($"event_id")
  }

  /** T2 — processing-time daily tumbling batch (`dag` daily 01:00 re-agg),
    * batch-expressed as a date_trunc group. */
  private def tumblingDaily(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", $"ts").as("d_ts"))
      .agg(count(lit(1)).as("n"), pround(sum($"value"), 2).as("total"))
      .orderBy($"d_ts")
  }

  /** Hopping (sliding) window aggregation — 6-hour windows advancing every
    * 3 hours, the Flink/KSQL HOP/Kafka-Streams hopping-window semantics:
    * each event lands in size/slide = 2 overlapping windows. Spark's
    * `window(ts, size, slide)` generator emits the covering windows
    * map-side (a 2× row expansion BEFORE the aggregation, combined by
    * partial aggregates — never a self-join of bucket spines), then one
    * partial+final hash agg on (window, type); the same
    * explode-into-covered-windows shape as `ts_rolling_distinct`. Both
    * engines align buckets to the epoch, verified by `ts_resample`. */
  private def hopping(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(window($"ts", "6 hours", "3 hours").getField("start").as("w_start"),
        $"event_type")
      // exact mean: per-row micro-round → BIGINT sum → one division (the
      // double avg flipped the 1e-4 quantum on 2 of 1205 cells at 100×)
      .agg(count(lit(1)).as("n"),
        (floor(sum(round($"value" * 1e6).cast("long")) /
          (count(lit(1)) * lit(100.0)) + lit(0.5)) / lit(10000.0)).as("avg_value"))
      .orderBy($"w_start", $"event_type")
  }

  /** T6 — gap-based sessionization (30-min inactivity), in the SKEW-SAFE
    * two-phase form: the classic one-window formulation partitions by
    * `user_id` alone, so one hot user's entire history sorts in ONE task —
    * measured ×2.7 degradation at the 100×-Zipf probe, where the top user
    * owns ~10% of all events (real event data IS that skewed: the
    * reference's own dashboard shows a 22,724-edit top title vs a 941,690
    * "Other" bucket). Here:
    *
    *  - Phase 1 partitions by (user, day-bucket): within a bucket the
    *    lag + cumulative-sum sessionizer runs unchanged, so a hot user's
    *    events spread over as many tasks as days — per-task work is
    *    bounded by events-per-user-day, not events-per-user.
    *  - Phase 2 merges ACROSS buckets on per-bucket SESSION SUMMARIES
    *    (start/end µs, count): sessions ordered by start are also ordered
    *    by end (bucket ranges are disjoint, in-bucket sessions disjoint),
    *    so one lag(prev end) window over session rows — orders of
    *    magnitude fewer than events; a dense user compresses to ~1
    *    session per bucket — chains boundary-crossing sessions, and a
    *    final (user, sid) aggregate re-assembles counts and bounds.
    *
    * The result is IDENTICAL to the one-window form (sid = per-user
    * time-ordinal; the oracle pins it cell-exact): a session's events are
    * never > gap apart, so a session crosses a bucket edge only via
    * boundary-adjacent sub-sessions, exactly what phase 2 re-joins. Worst
    * case (every event its own session) degrades to the classic cost; the
    * bucket width is a constant trade (smaller = more parallel, more
    * merge rows). Epoch-µs arithmetic for engine parity. */
  private def session(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val gapUs = 1800000000L
    val bucketUs = 86400000000L // 1 day
    val wB = Window.partitionBy($"user_id", $"bk").orderBy($"us".asc, $"event_id".asc)
    val wBCum = wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBucket = Tables.events(spark, sfDir)
      .withColumn("us", unix_micros($"ts".cast("timestamp")))
      .withColumn("bk", floor($"us" / bucketUs))
      .withColumn("new_sess",
        when(lag($"us", 1).over(wB).isNull ||
             $"us" - lag($"us", 1).over(wB) > gapUs, 1L).otherwise(0L))
      .withColumn("lsid", sum($"new_sess").over(wBCum))
      .groupBy($"user_id", $"bk", $"lsid")
      .agg(count(lit(1)).as("n"), min($"ts").as("t_start"), max($"ts").as("t_end"),
        min($"us").as("us_s"), max($"us").as("us_e"))
    val wU = Window.partitionBy($"user_id").orderBy($"us_s".asc)
    val wUCum = wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .withColumn("new_sess",
        when(lag($"us_e", 1).over(wU).isNull ||
             $"us_s" - lag($"us_e", 1).over(wU) > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum($"new_sess").over(wUCum))
      .groupBy($"user_id", $"sid")
      .agg(sum($"n").as("n_events"), min($"t_start").as("t_start"), max($"t_end").as("t_end"))
      .orderBy($"user_id", $"sid")
  }

  /** T6 native form — the built-in `session_window` generator: the same
    * gap sessionization as [[session]] expressed declaratively (and the
    * form that runs under Structured Streaming with watermark state
    * eviction). Break rule is strict: a gap EXACTLY equal to 30 min still
    * MERGES (verified empirically on Spark 4.1.2 — events 10:00 and 10:30
    * with a 30-min gap form one session), identical to the manual lag
    * formulation's `> gap` break; the oracle replays strict >. Output
    * differs from [[session]] only in shape: window [start, last+gap)
    * bounds instead of a session ordinal. */
  private def sessionNative(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"sw.start".as("s_start"), $"sw.end".as("s_end"),
        $"n_events")
      .orderBy($"user_id", $"s_start")
  }

  /** W6 — value-position analytics: first/last/nth event value per day
    * over the full-frame window. */
  private def firstLast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wFull = Window.partitionBy($"d")
      .orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wOrd = Window.partitionBy($"d").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(spark, sfDir)
      .withColumn("d", to_date($"ts"))
      .withColumn("fv", first($"value").over(wFull))
      .withColumn("lv", last($"value").over(wFull))
      .withColumn("nv", nth_value($"value", 2).over(wFull))
      .withColumn("rn", row_number().over(wOrd))
      .filter($"rn" === 1)
      .select($"d", $"fv", $"lv", $"nv")
      .orderBy($"d")
  }

  /** Gaps-and-islands: each user's maximal streaks of CONSECUTIVE active
    * days (start, end, length) — the classic SQL idiom (island key =
    * day − row_number(), constant within a consecutive run) and the
    * engagement-streak feature behind retention analyses; the calendar
    * twin of [[session]]'s timestamp-gap sessionization.
    *
    * Scale shape (100 TB): facts dedup to (user, day) in one
    * partial-aggregated pass (bounded by users × days, far smaller than
    * events); the row_number window and the island groupBy share ONE
    * user-clustered exchange (user is a prefix of the island grouping
    * key, so the final aggregate re-uses the window's partitioning —
    * PlanSpec gates exactly 2 hash exchanges). Nothing is quadratic, no
    * self-join per gap. All-integer arithmetic. */
  private def gapsIslands(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ud = Tables.events(spark, sfDir)
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val w = Window.partitionBy($"user_id").orderBy($"d".asc)
    ud.withColumn("grp", date_sub($"d", row_number().over(w)))
      .groupBy($"user_id", $"grp")
      .agg(min($"d").as("streak_start"), max($"d").as("streak_end"),
        count(lit(1)).as("len"))
      .select($"user_id", $"streak_start", $"streak_end", $"len")
      .orderBy($"user_id", $"streak_start")
  }

  override def queries: Map[String, QueryFn] = Map(
    "win_gaps_islands"   -> gapsIslands,
    "win_first_last"     -> firstLast,
    "win_rank_topn"      -> rankTopN,
    "win_lag_delta"      -> lagDelta,
    "win_moving_avg"     -> movingAvg,
    "win_range_frame"    -> rangeFrame,
    "win_ntile"          -> ntileQ,
    "win_percent_rank"   -> percentRankQ,
    "win_tumbling_daily" -> tumblingDaily,
    "win_hopping"        -> hopping,
    "win_session"        -> session,
    "win_session_native" -> sessionNative
  )

  override def oracles: Map[String, String] = Map(
    "win_gaps_islands" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |g AS (
        |  SELECT user_id, d,
        |         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
        |                  AS INTEGER) AS grp
        |  FROM ud)
        |SELECT user_id, min(d) AS streak_start, max(d) AS streak_end,
        |       count(*) AS len
        |FROM g GROUP BY user_id, grp
        |ORDER BY user_id, streak_start""".stripMargin,
    "win_first_last" ->
      """SELECT d, fv, lv, nv FROM (
        |  SELECT CAST(ts AS DATE) AS d,
        |         first_value(value) OVER w AS fv,
        |         last_value(value) OVER w AS lv,
        |         nth_value(value, 2) OVER w AS nv,
        |         row_number() OVER (PARTITION BY CAST(ts AS DATE)
        |                            ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY CAST(ts AS DATE) ORDER BY ts ASC, event_id ASC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |WHERE rn = 1 ORDER BY d""".stripMargin,
    "win_rank_topn" ->
      """SELECT d, rn, event_type, n FROM (
        |  SELECT d, event_type, n,
        |         CAST(row_number() OVER (PARTITION BY d ORDER BY n DESC, event_type ASC) AS BIGINT) AS rn
        |  FROM (SELECT CAST(ts AS DATE) AS d, event_type, count(*) AS n
        |        FROM events GROUP BY 1, 2))
        |WHERE rn <= 3 ORDER BY d, rn""".stripMargin,
    "win_percent_rank" ->
      """SELECT event_id, event_type,
        |       floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pr,
        |       floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cd
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
        |ORDER BY event_id""".stripMargin,
    "win_lag_delta" ->
      """SELECT d, n, n - lag(n, 1) OVER (ORDER BY d) AS delta
        |FROM (SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1)
        |ORDER BY d""".stripMargin,
    "win_moving_avg" ->
      """SELECT d, n,
        |       floor(avg(n) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100 AS ma7
        |FROM (SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1)
        |ORDER BY d""".stripMargin,
    "win_range_frame" ->
      """SELECT event_id,
        |       floor(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100 AS rsum
        |FROM events ORDER BY event_id""".stripMargin,
    "win_ntile" ->
      """SELECT o_orderkey,
        |       CAST(ntile(4) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS BIGINT) AS tile,
        |       floor(percent_rank() OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) * 1000000 + 0.5) / 1000000 AS pr
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "win_tumbling_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d_ts, count(*) AS n,
        |       floor(sum(value) * 100 + 0.5) / 100 AS total
        |FROM events GROUP BY 1 ORDER BY d_ts""".stripMargin,
    "win_hopping" ->
      """WITH cov AS (
        |  SELECT unnest([time_bucket(INTERVAL 3 HOURS, ts),
        |                 time_bucket(INTERVAL 3 HOURS, ts) - INTERVAL 3 HOURS])
        |           AS w_start,
        |         event_type, value
        |  FROM events)
        |SELECT w_start, event_type, count(*) AS n,
        |       floor(CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
        |             / (count(*) * 100.0) + 0.5) / 10000.0 AS avg_value
        |FROM cov GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "win_session" ->
      """WITH t AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
        |         CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)),
        |s AS (
        |  SELECT user_id, ts,
        |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM t)
        |SELECT user_id, sid, count(*) AS n_events, min(ts) AS t_start, max(ts) AS t_end
        |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin,
    "win_session_native" ->
      """WITH t AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts, 1) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC)),
        |s AS (
        |  SELECT user_id, ts,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM t)
        |SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin
  )
}
