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

  /** Per-group z-score outlier flagging: events whose `value` sits more
    * than 1.5 population-σ from their event_type's mean (1.5 is a demo
    * threshold — the fixture's near-uniform values have no 3σ tail).
    *
    * Scale shape: the per-type moment aggregation reduces the fact table
    * to |types| rows map-side; joining it back is an auto-broadcast (the
    * stats side is tiny by construction), so the detector is one scan +
    * one broadcast join — no self-join, no window over the full facts. */
  private def tsZscoreOutlier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    // moments over the FINITE domain only (robust-statistics convention,
    // both dialects): one NaN/Inf observation would otherwise poison mu/
    // sigma for the whole type — and DuckDB's stddev errors outright on
    // ±Inf. Non-finite rows still SCORE (z = ±Inf emitted, NaN excluded
    // by the threshold compare) — identical in both engines.
    val stats = e.filter(abs($"value") < lit(Double.PositiveInfinity))
      .groupBy($"event_type")
      .agg(avg($"value").as("mu"), stddev_pop($"value").as("sigma"))
    e.join(stats, Seq("event_type"))
      .withColumn("z", pround(($"value" - $"mu") / $"sigma", 4))
      .filter(abs($"z") > 1.5)
      .select($"event_id", $"event_type", pround($"value", 4).as("value"), $"z")
      .orderBy($"event_id")
  }

  /** Trailing-window EWMA (α = 0.5, last 20 observations) of `value` per
    * user, ordered by event time — the monitoring-style smoothed series.
    *
    * The textbook recursive EWMA (e_i = αx_i + (1-α)e_{i-1}) is a
    * sequential scan no engine's declarative layer expresses without
    * either exponent blow-up (the closed-form prefix trick overflows
    * (1-α)^-n past ~700 rows) or an imperative per-partition pass. The
    * trailing-window form is the bounded-state equivalent: weights below
    * 0.5^20 are < 1e-6 — under the output rounding — so the truncation is
    * exact at the reported precision. Implemented as ONE window
    * (collect_list over a 20-row frame) + a codegen'd higher-order fold;
    * α = 0.5 deliberately: every weight is a power of two, so Spark and
    * DuckDB compute bit-identical products and the cross-engine hash
    * match does not ride on libm pow rounding. Normalized (adjust=true)
    * so short prefixes are unbiased: e = Σ w_i x_i / Σ w_i. */
  private def tsEwma(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(-19, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("arr", collect_list($"value").over(w))
      .withColumn("num", expr(
        "aggregate(zip_with(arr, sequence(size(arr)-1, 0, -1)," +
          " (x, k) -> x * power(0.5D, k)), 0D, (a, v) -> a + v)"))
      .withColumn("den", lit(2.0) * (lit(1.0) - pow(lit(0.5), size($"arr"))))
      .select($"event_id", $"user_id", pround($"num" / $"den", 4).as("ewma"))
      .orderBy($"event_id")
  }

  /** Robust (median/MAD) outlier detection — the modified z-score of
    * Iglewicz–Hoaglin (0.6745·(x−med)/MAD > 3.5): unlike
    * [[tsZscoreOutlier]] the detector itself is outlier-resistant (mean
    * and σ are dragged by the very tail they're meant to flag; the
    * median pair is not — the robust-statistics standard for monitoring
    * pipelines).
    *
    * Scale shape: two grouped EXACT medians (per-type state bounded by
    * group size; the operators sort within hash groups, fine while
    * |types| is small and per-type rows fit a task — at extreme group
    * sizes swap `median` for `approx_percentile(0.5)`, same plan), each
    * reduced frame broadcast back; the flag itself is row-local. */
  private def tsMadOutlier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    // median/MAD over the FINITE domain (the [[tsZscoreOutlier]]
    // convention): engines order NaN/Inf differently inside quantiles,
    // and a robust estimator poisoned by the values it exists to resist
    // is self-defeating; non-finite rows still score against the finite
    // center
    val fin = e.filter(abs($"value") < lit(Double.PositiveInfinity))
    val med = fin.groupBy($"event_type").agg(median($"value").as("med"))
    val stats = fin.join(broadcast(med), "event_type")
      .groupBy($"event_type")
      .agg(median(abs($"value" - $"med")).as("mad"), min($"med").as("med"))
    e.join(broadcast(stats), "event_type")
      .withColumn("mz", pround(expr("0.6745 * (value - med) / mad"), 4))
      .filter(abs($"mz") > 3.5)
      .select($"event_id", $"event_type", pround($"value", 4).as("value"), $"mz")
      .orderBy($"event_id")
  }

  /** Linear interpolation of a sparse series onto a dense grid — the
    * companion to [[tsFillForward]] (LOCF) for metrics where a straight
    * line between observations beats a step function (sensor readings,
    * sampled gauges). Known points: hourly mean `value` of a 1%-of-users
    * cohort (`user_id % 97 = 0`), genuinely sparse at every fixture SF;
    * grid: every hour in the table's span × event_type. Interior gaps get
    * `prev + (next-prev)·Δt/Δt_total`; points before the first / after the
    * last observation stay null (interpolation, not extrapolation).
    *
    * Scale shape: the fact table collapses to the known-point relation in
    * ONE partial+final aggregation; the spine is `sequence()` from a
    * 1-row bound agg × the tiny type dim — spine size = hours × types,
    * independent of fact cardinality. The prev/next attachment is two
    * linear passes over the spine (windows partitioned by type, never a
    * self-join or point probe per gap). The interpolation arithmetic runs
    * on ALREADY-ROUNDED endpoint values, so the cross-engine hash match
    * never rides on aggregation order. */
  private def tsInterpolateLinear(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val known = e.filter($"user_id" % 97 === 0)
      .groupBy(window($"ts", "1 hour").getField("start").as("bucket"),
        $"event_type")
      // exact mean: per-ROW micro-round to BIGINT, integer sum, one
      // division — a double avg's accumulation noise flipped the 1e-4
      // quantum on boundary cells at the 100× replica volume (the
      // round-then-aggregate order is what makes it order-independent)
      .agg((floor(sum(round($"value" * 1e6).cast("long")) /
          (count(lit(1)) * lit(100.0)) + lit(0.5)) / lit(10000.0)).as("v"))
    val spine = e
      .agg(date_trunc("hour", min($"ts")).as("lo"),
        date_trunc("hour", max($"ts")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("bucket"))
      .crossJoin(e.select($"event_type").distinct())
    val wPrev = Window.partitionBy($"event_type").orderBy($"bucket".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy($"event_type").orderBy($"bucket".asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(known, Seq("bucket", "event_type"), "left_outer")
      .withColumn("pv", last($"v", ignoreNulls = true).over(wPrev))
      .withColumn("pt",
        last(when($"v".isNotNull, $"bucket"), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first($"v", ignoreNulls = true).over(wNext))
      .withColumn("nt",
        first(when($"v".isNotNull, $"bucket"), ignoreNulls = true).over(wNext))
      .withColumn("filled", when($"v".isNotNull, $"v").otherwise(
        $"pv" + ($"nv" - $"pv") *
          ((unix_timestamp($"bucket") - unix_timestamp($"pt")) /
            (unix_timestamp($"nt") - unix_timestamp($"pt")))))
      .select($"bucket", $"event_type", pround($"filled", 4).as("v_interp"),
        ($"v".isNull && $"pv".isNotNull && $"nv".isNotNull).as("was_gap"))
      .orderBy($"bucket", $"event_type")
  }

  /** CUSUM changepoint detection (Page 1954) over the daily mean series
    * per event type — the classical sequential drift detector a
    * monitoring pipeline runs on metric series (and a data pipeline runs
    * on per-shard quality metrics to catch ingest regressions). Positive
    * CUSUM with slack k = σ/2 and decision threshold h = 5σ, the
    * textbook parameterization.
    *
    * The recurrence S_i = max(0, S_{i-1} + d_i) looks inherently
    * sequential, but has an exact closed form over prefix sums:
    * with P_i = Σ_{j≤i} d_j,  S_i = P_i − min(0, min_{j≤i} P_j) —
    * a window prefix SUM plus a running MIN, both single-pass window
    * functions. No recursion, no per-row iteration, no collect.
    *
    * Scale shape (100 TB): facts partial-aggregate to type×day cells
    * (the only corpus-sized pass); per-type stats reduce those cells and
    * broadcast back; the two stacked windows share one hash partition on
    * event_type over the day-cell frame. Everything after the first
    * aggregate is proportional to types × days, not events.
    *
    * Determinism: daily means and per-type mean/σ micro-round to BIGINT
    * micros (the [[tsEwma]]-family convention); from there the slack
    * subtraction, prefix sums, running min, and threshold compare are
    * ALL exact integer arithmetic — accumulation order cannot perturb a
    * bit, and no float ever sits on the change/no-change boundary. */
  private def tsCusumChangepoint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      // finite domain (the [[tsZscoreOutlier]] convention): one Inf
      // observation would overflow the micro-quantized long under ANSI
      .filter(abs($"value") < lit(Double.PositiveInfinity))
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(floor(avg($"value") * 1e6 + 0.5).cast("long").as("x_m"))
    val stats = daily.groupBy($"event_type")
      .agg(floor(avg($"x_m") + 0.5).cast("long").as("mu_m"),
        floor(stddev_pop($"x_m") + 0.5).cast("long").as("sd_m"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
    daily.join(broadcast(stats), Seq("event_type"))
      .withColumn("d_m", $"x_m" - $"mu_m" - floor($"sd_m" / 2).cast("long"))
      .withColumn("p_m", sum($"d_m").over(w))
      .withColumn("s_m", $"p_m" - least(lit(0L), min($"p_m").over(w)))
      .select($"event_type", $"day",
        ($"x_m" / 1e6).as("daily_avg"),
        ($"s_m" / 1e6).as("cusum"),
        ($"s_m" > $"sd_m" * 5).as("is_change"))
      .orderBy($"event_type", $"day")
  }

  private val AcfMaxLag = 7

  /** Sample autocorrelation function of the daily event-count series at
    * lags 1..[[AcfMaxLag]] (Box–Jenkins r_k, the unadjusted estimator:
    * lagged covariance over the pairs divided by the full-series
    * variance) — the seasonality/trend diagnostic a pipeline runs on any
    * ingest-volume series before alerting on it (a strong lag-7 spike =
    * weekly cycle; slow decay = trend — pick detectors accordingly).
    *
    * Scale shape (100 TB): the ONLY corpus-sized pass is the daily
    * partial+final count; everything after is proportional to calendar
    * days (the [[tsCusumChangepoint]] regime) — the unpartitioned lead
    * window runs over a days-bounded frame, never over facts. Lags
    * expand map-side (explode of a k-struct array), then one bounded
    * groupBy(lag).
    *
    * Determinism: the series is INTEGER counts, so every aggregate the
    * estimator needs (Σx, Σx², Σx·y per lag) is exact BIGINT and the
    * mean never materializes as a float — r_k clears denominators to
    * r_k = [n²P_k − nS(A_k+B_k) + (n−k)S²] / (n(nQ − S²)), one double
    * division of exact integers at the very end, identical bits in both
    * engines. (At extreme daily volumes the BIGINT products need the
    * counts downscaled or DECIMAL(38) — the day-bounded structure is
    * unchanged.) */
  private def tsAutocorr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // two consumers (lag expansion + the global moment aggregate) — pin
    // the days-bounded reduction so the corpus scans ONCE
    val daily = Materialize.once(
      Tables.events(spark, sfDir)
        .groupBy(to_date($"ts").as("day"))
        .agg(count(lit(1)).as("x")))
    val w = Window.orderBy($"day".asc)
    val withLeads = (1 to AcfMaxLag).foldLeft(daily)((d, k) =>
      d.withColumn(s"y$k", lead($"x", k).over(w)))
    val pairs = withLeads
      .select(explode(array((1 to AcfMaxLag).map(k =>
        struct(lit(k.toLong).as("lag"), $"x", col(s"y$k").as("y"))): _*)).as("p"))
      .select($"p.*")
      .filter($"y".isNotNull)
    val glob = daily.agg(count(lit(1)).as("n"), sum($"x").as("s"),
      sum($"x" * $"x").as("q"))
    pairs.groupBy($"lag")
      .agg(sum($"x" * $"y").as("pk"), sum($"x").as("ak"), sum($"y").as("bk"))
      .crossJoin(broadcast(glob))
      .select($"lag",
        pround(
          ($"n" * $"n" * $"pk" - $"n" * $"s" * ($"ak" + $"bk") +
            ($"n" - $"lag") * $"s" * $"s").cast("double") /
            ($"n" * ($"n" * $"q" - $"s" * $"s")).cast("double"), 6).as("acf"))
      .orderBy($"lag")
  }

  /** Classical additive seasonal decomposition of the daily event-count
    * series (the moving-average method STL descends from): trend =
    * centered 7-day moving average (defined only where the full window
    * exists — decomposition, not extrapolation), seasonal = day-of-week
    * mean of the detrended series, residual = x − trend − seasonal. The
    * diagnostic that separates "weekly cycle" from "real anomaly" before
    * alerting on an ingest-volume series — the decomposition twin of
    * [[tsAutocorr]] (which only detects the cycle) and
    * [[tsCusumChangepoint]] (which a seasonal series false-alarms
    * without this).
    *
    * Scale shape (100 TB): one corpus-sized partial+final daily count;
    * the moving-average window, DOW aggregation, and seasonal
    * broadcast-attach all run on the days-bounded frame.
    *
    * Determinism: the series is INTEGER counts; the trend is the exact
    * 7-int window sum divided once and micro-quantized to BIGINT; DOW is
    * epoch-day mod 7 (engine-neutral — dayofweek() origins differ);
    * seasonal averages the BIGINT micro deviations (one division,
    * micro-quantized); the residual is a BIGINT subtraction. No float
    * accumulation anywhere. */
  private def tsSeasonalDecompose(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the trend frame feeds both the seasonal aggregate and the final
    // join — pin the days-bounded reduction so the corpus scans ONCE
    val daily = Materialize.once(
      Tables.events(spark, sfDir)
        .groupBy(to_date($"ts").as("day"))
        .agg(count(lit(1)).as("x")))
    val w = Window.orderBy($"day".asc).rowsBetween(-3, 3)
    val tr = daily
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("t_m",
        when($"win_n" === 7,
          floor(sum($"x").over(w).cast("double") / 7 * 1e6 + 0.5).cast("long")))
      .withColumn("dow", datediff($"day", lit("1970-01-01").cast("date")) % 7)
      .withColumn("dev_m", $"x" * 1000000L - $"t_m")
    val seasonal = tr.filter($"t_m".isNotNull)
      .groupBy($"dow")
      .agg(floor(avg($"dev_m") + 0.5).cast("long").as("s_m"))
    tr.join(broadcast(seasonal), Seq("dow"))
      .select($"day", $"x",
        ($"t_m" / 1e6).as("trend"),
        ($"s_m" / 1e6).as("seasonal"),
        (($"x" * 1000000L - $"t_m" - $"s_m") / 1e6).as("residual"))
      .orderBy($"day")
  }

  /** Seasonal-naive forecast backtest: forecast(day) = count(day − 7) —
    * the no-skill baseline every real forecaster must beat (and the
    * standard denominator of the MASE metric), evaluated in-sample as
    * per-day absolute error. Complements [[tsSeasonalDecompose]]: the
    * decomposition EXPLAINS the weekly cycle, this one exploits it as a
    * predictor and measures the residual ingest-volume surprise.
    *
    * Scale shape (100 TB): one corpus pass partial-aggregates to the
    * days-bounded daily frame; the lag-7 window and the error projection
    * run on ≤ days rows (single-partition BY CONSTRUCTION, the module's
    * daily-series convention). All-integer end to end. */
  private def tsForecastSnaive(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("d"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy($"d")
    daily.withColumn("fc", lag($"n", 7).over(w))
      .filter($"fc".isNotNull)
      .select($"d", $"n", $"fc", abs($"n" - $"fc").as("abs_err"))
      .orderBy($"d")
  }

  override def queries: Map[String, QueryFn] = Map(
    "ts_forecast_snaive"   -> tsForecastSnaive,
    "ts_seasonal_decompose" -> tsSeasonalDecompose,
    "ts_autocorr"          -> tsAutocorr,
    "ts_cusum_changepoint" -> tsCusumChangepoint,
    "ts_interpolate_linear" -> tsInterpolateLinear,
    "ts_mad_outlier"      -> tsMadOutlier,
    "ts_gapfill"          -> tsGapfill,
    "ts_fill_forward"     -> tsFillForward,
    "ts_resample"         -> tsResample,
    "ts_rolling_distinct" -> tsRollingDistinct,
    "ts_rolling_distinct_approx" -> tsRollingDistinctApprox,
    "ts_zscore_outlier"   -> tsZscoreOutlier,
    "ts_ewma"             -> tsEwma
  )

  /** Mirrors [[tsAutocorr]]: `l` is MATERIALIZED because the per-lag
    * UNION references it [[AcfMaxLag]] times (the CTE-inlining lesson). */
  private def acfOracle: String = {
    val lagCols = (1 to AcfMaxLag)
      .map(k => s"lead(x, $k) OVER (ORDER BY day) AS y$k").mkString(", ")
    val unions = (1 to AcfMaxLag)
      .map(k => s"SELECT CAST($k AS BIGINT) AS lag, x, y$k AS y FROM l WHERE y$k IS NOT NULL")
      .mkString("\n      UNION ALL ")
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day, count(*) AS x FROM events GROUP BY 1),
       |g AS (SELECT count(*) AS n, sum(x) AS s, sum(x * x) AS q FROM daily),
       |l AS MATERIALIZED (SELECT day, x, $lagCols FROM daily),
       |p AS ($unions),
       |a AS (SELECT lag, sum(x * y) AS pk, sum(x) AS ak, sum(y) AS bk
       |      FROM p GROUP BY 1)
       |SELECT lag,
       |  floor(CAST(n * n * pk - n * s * (ak + bk) + (n - lag) * s * s AS DOUBLE)
       |        / CAST(n * (n * q - s * s) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS acf
       |FROM a CROSS JOIN g ORDER BY lag""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "ts_forecast_snaive" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1),
        |f AS (SELECT d, n, lag(n, 7) OVER (ORDER BY d) AS fc FROM daily)
        |SELECT d, n, fc, abs(n - fc) AS abs_err
        |FROM f WHERE fc IS NOT NULL ORDER BY d""".stripMargin,
    "ts_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS x FROM events GROUP BY 1),
        |tr AS MATERIALIZED (
        |  SELECT day, x,
        |    CASE WHEN count(*) OVER w = 7 THEN
        |      CAST(floor(CAST(sum(x) OVER w AS DOUBLE) / 7 * 1e6 + 0.5) AS BIGINT)
        |    END AS t_m,
        |    (day - DATE '1970-01-01') % 7 AS dow
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |s AS (SELECT dow,
        |        CAST(floor(avg(x * 1000000 - t_m) + 0.5) AS BIGINT) AS s_m
        |      FROM tr WHERE t_m IS NOT NULL GROUP BY 1)
        |SELECT day, x, t_m / 1e6 AS trend, s_m / 1e6 AS seasonal,
        |       (x * 1000000 - t_m - s_m) / 1e6 AS residual
        |FROM tr JOIN s USING (dow) ORDER BY day""".stripMargin,
    "ts_autocorr" -> acfOracle,
    "ts_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(floor(avg(value) * 1e6 + 0.5) AS BIGINT) AS x_m
        |  FROM events WHERE isfinite(value) GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type,
        |         CAST(floor(avg(x_m) + 0.5) AS BIGINT) AS mu_m,
        |         CAST(floor(stddev_pop(x_m) + 0.5) AS BIGINT) AS sd_m
        |  FROM daily GROUP BY 1),
        |d AS (
        |  SELECT daily.event_type, day, x_m, mu_m, sd_m,
        |         x_m - mu_m - CAST(floor(sd_m / 2) AS BIGINT) AS d_m
        |  FROM daily JOIN stats USING (event_type)),
        |p AS (
        |  SELECT *, sum(d_m) OVER (PARTITION BY event_type ORDER BY day) AS p_m
        |  FROM d),
        |s AS (
        |  SELECT *, p_m - least(0, min(p_m) OVER (PARTITION BY event_type
        |                                          ORDER BY day)) AS s_m
        |  FROM p)
        |SELECT event_type, day, x_m / 1e6 AS daily_avg, s_m / 1e6 AS cusum,
        |       s_m > sd_m * 5 AS is_change
        |FROM s ORDER BY event_type, day""".stripMargin,
    "ts_interpolate_linear" ->
      """WITH known AS (
        |  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type,
        |         floor(CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
        |               / (count(*) * 100.0) + 0.5) / 10000.0 AS v
        |  FROM events WHERE user_id % 97 = 0 GROUP BY 1, 2),
        |spine AS (
        |  SELECT unnest(generate_series(date_trunc('hour', min(ts)),
        |                                date_trunc('hour', max(ts)),
        |                                INTERVAL 1 HOUR)) AS bucket
        |  FROM events),
        |keys AS (SELECT DISTINCT event_type FROM events),
        |j AS (
        |  SELECT s.bucket, k.event_type, kn.v
        |  FROM spine s CROSS JOIN keys k
        |  LEFT JOIN known kn ON kn.bucket = s.bucket AND kn.event_type = k.event_type),
        |w AS (
        |  SELECT bucket, event_type, v,
        |    last_value(v IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY bucket
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY bucket
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        |    first_value(v IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY bucket
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY bucket
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        |  FROM j)
        |SELECT bucket, event_type,
        |  floor((CASE WHEN v IS NOT NULL THEN v
        |         ELSE pv + (nv - pv) *
        |              ((epoch(bucket) - epoch(pt)) / (epoch(nt) - epoch(pt))) END)
        |        * 1e4 + 0.5) / 1e4 AS v_interp,
        |  (v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL) AS was_gap
        |FROM w ORDER BY bucket, event_type""".stripMargin,
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
        |GROUP BY 1 ORDER BY wd""".stripMargin,
    "ts_mad_outlier" ->
      """WITH fin AS (SELECT * FROM events WHERE isfinite(value)),
        |med AS (
        |  SELECT event_type, median(value) AS med FROM fin GROUP BY 1),
        |stats AS (
        |  SELECT e.event_type, median(abs(e.value - m.med)) AS mad,
        |         min(m.med) AS med
        |  FROM fin e JOIN med m USING (event_type) GROUP BY 1)
        |SELECT event_id, event_type,
        |  floor(value * 1e4 + 0.5) / 1e4 AS value,
        |  floor(0.6745 * (value - med) / mad * 1e4 + 0.5) / 1e4 AS mz
        |FROM events JOIN stats USING (event_type)
        |WHERE abs(floor(0.6745 * (value - med) / mad * 1e4 + 0.5) / 1e4) > 3.5
        |ORDER BY event_id""".stripMargin,
    "ts_zscore_outlier" ->
      """WITH stats AS (
        |  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
        |  FROM events WHERE isfinite(value) GROUP BY 1)
        |SELECT event_id, event_type,
        |  floor(value * 1e4 + 0.5) / 1e4 AS value,
        |  floor((value - mu) / sigma * 1e4 + 0.5) / 1e4 AS z
        |FROM events JOIN stats USING (event_type)
        |WHERE abs(floor((value - mu) / sigma * 1e4 + 0.5) / 1e4) > 1.5
        |ORDER BY event_id""".stripMargin,
    "ts_ewma" ->
      """WITH w AS (
        |  SELECT event_id, user_id,
        |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS arr
        |  FROM events)
        |SELECT event_id, user_id,
        |  floor(list_sum(list_transform(list_zip(arr, list_reverse(range(len(arr)))),
        |          p -> p[1] * power(0.5, p[2])))
        |        / (2 * (1 - power(0.5, len(arr)))) * 1e4 + 0.5) / 1e4 AS ewma
        |FROM w ORDER BY event_id""".stripMargin
  )
}
