package graft.rel

import graft.{QueryModule, Tables}
import graft.functions.PortableRound.pround
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical / analytical aggregate surface: second-moment statistics,
  * linear-regression aggregates, mode/median, ordered string aggregation,
  * grouping-id labeling, bucketed histograms, and bitwise aggregates.
  *
  * The reference's only aggregate is `count(*)` (`dag/wiki_pipeline_dag.py:36`)
  * — this family is what its QuickSight layer computes visually (averages,
  * distributions, top-N funnels) pushed down into the engine.
  *
  * Scale notes (100 TB): every aggregate here is a single-pass,
  * constant-state-per-group hash aggregate with map-side partial merge —
  * variance/corr/regr via moment merges, mode via per-value counts (its state
  * is bounded by value cardinality, so keep it to low-cardinality columns at
  * scale), median exact only when grouped output is small (else
  * `approx_percentile` — see `agg_approx_quantile`).
  */
object StatsAggs extends QueryModule {

  /** Moment statistics per group: stddev/variance (sample + population),
    * correlation and covariance of (quantity, extendedprice). */
  private def aggStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        pround(stddev_samp($"l_quantity"), 6).as("sd_samp"),
        pround(stddev_pop($"l_quantity"), 6).as("sd_pop"),
        pround(var_samp($"l_quantity"), 6).as("v_samp"),
        pround(var_pop($"l_quantity"), 6).as("v_pop"),
        pround(corr($"l_quantity", $"l_extendedprice"), 6).as("qp_corr"),
        pround(covar_samp($"l_quantity", $"l_extendedprice"), 4).as("qp_covar"),
        pround(covar_pop($"l_quantity", $"l_extendedprice"), 4).as("qp_covar_pop"))
      .orderBy($"l_returnflag")
  }

  /** Higher moments: population skewness / excess kurtosis (Spark's
    * definitions); the oracle recomputes the same population formulas from
    * central moments since DuckDB's builtins are bias-corrected sample
    * statistics. */
  private def aggSkewKurt(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_linestatus")
      .agg(
        pround(skewness($"l_extendedprice"), 6).as("sk"),
        pround(kurtosis($"l_extendedprice"), 6).as("ku"))
      .orderBy($"l_linestatus")
  }

  /** Linear-regression aggregates of extendedprice on quantity per flag. */
  private def aggRegr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        pround(regr_slope($"l_extendedprice", $"l_quantity"), 6).as("slope"),
        pround(regr_intercept($"l_extendedprice", $"l_quantity"), 4).as("intercept"),
        pround(regr_r2($"l_extendedprice", $"l_quantity"), 6).as("r2"),
        regr_count($"l_extendedprice", $"l_quantity").as("n"),
        pround(regr_avgx($"l_extendedprice", $"l_quantity"), 6).as("avgx"),
        pround(regr_avgy($"l_extendedprice", $"l_quantity"), 4).as("avgy"))
      .orderBy($"l_returnflag")
  }

  /** Exact mode and median per group (low-cardinality group keys). */
  private def aggModeMedian(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_linestatus")
      .agg(
        mode($"l_returnflag").as("mode_flag"),
        pround(median($"l_quantity"), 4).as("med_qty"),
        pround(median($"l_extendedprice"), 4).as("med_price"))
      .orderBy($"l_linestatus")
  }

  /** Ordered string aggregation (`listagg ... WITHIN GROUP`). */
  private def aggStringAgg(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.nation(spark, sfDir).createOrReplaceTempView("g_nation")
    spark.sql(
      """SELECT n_regionkey,
        |       listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
        |FROM g_nation
        |GROUP BY n_regionkey
        |ORDER BY n_regionkey""".stripMargin)
  }

  /** Rollup with grouping-id labels: totals are explicitly tagged instead of
    * surfacing as ambiguous NULL group keys. */
  private def aggGroupingId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), grouping_id().cast("bigint").as("gid"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("rf"),
        coalesce($"l_linestatus", lit("ALL")).as("ls"),
        $"gid",
        $"n")
      .orderBy($"gid", $"rf", $"ls")
  }

  /** Fixed-width bucketed histogram of quantity over [0, 50) in 10 buckets. */
  private def aggWidthBucket(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy(width_bucket($"l_quantity", lit(0d), lit(50d), lit(10)).as("bucket"))
      .agg(count(lit(1)).as("n"), pround(sum($"l_quantity"), 2).as("qty"))
      .orderBy($"bucket")
  }

  /** Bitwise aggregates over the line number per flag. */
  private def aggBitwise(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        bit_and($"l_linenumber").cast("bigint").as("b_and"),
        bit_or($"l_linenumber").cast("bigint").as("b_or"),
        bit_xor($"l_linenumber").cast("bigint").as("b_xor"))
      .orderBy($"l_returnflag")
  }

  /** Conditional / boolean aggregate family: count_if + bool_and/bool_or
    * (SQL EVERY/SOME) per event type — the FILTER-clause aggregates every
    * metrics layer leans on. All are plain partial+final hash aggregates
    * (a boolean partial is one byte), so the shuffle stays one row per
    * (partition, group) at any scale. */
  private def aggBool(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(
        count_if($"value" > 100).as("n_big"),
        count_if($"value".isNull).as("n_null"),
        bool_and($"value".isNotNull).as("all_present"),
        bool_or($"value" > 500).as("any_huge"))
      .orderBy($"event_type")
  }

  /** Shannon entropy (nats), normalized entropy, and Gini impurity of
    * each source's language distribution over `documents` — the
    * label-balance diagnostics a training pipeline computes per corpus
    * slice before fixing a sampling mix (a near-zero entropy source is
    * monolingual; Gini is the same signal with cheaper arithmetic and a
    * bounded [0, 1−1/k] range).
    *
    * Scale shape (100 TB): facts partial-aggregate to (source × lang)
    * cells in one pass; the divergence math runs on that bounded cell
    * frame (second groupBy over ≤ sources·langs rows). Proportions are
    * exact-BIGINT count ratios, so cross-engine drift is confined to ln
    * ulps under the 1e-6 rounding (the [[aggStats]] convention). */
  /** Wilson 95% score interval on the daily error-event rate — the
    * monitoring statistic a rate alert should use instead of the raw
    * proportion (the naive ±1.96·√(p(1−p)/n) interval collapses to
    * width 0 at p=0, silencing exactly the low-volume days that need the
    * widest uncertainty; Wilson stays proper at the boundaries).
    * z = 1.96 enters as a literal in both dialects.
    *
    * Scale shape (100 TB): one partial+final aggregation to the
    * days-bounded (n, x) cells; the interval arithmetic is a handful of
    * closed-form expressions per cell, written in the identical operation
    * order in both engines so the doubles agree before rounding.
    *
    * Output convention: rate/lo/hi ship as exact micro-unit BIGINTs
    * (×1e6 — the `curation_dsir`/`eval_quality_auc` integer convention)
    * rather than rounded doubles, so the cross-engine hash contract is
    * immune to float canonicalization differences downstream. */
  private def aggRateCi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val z = 1.96
    val z2 = lit(z) * lit(z)
    Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("d"))
      .agg(count(lit(1)).as("n"),
        sum(($"event_type" === "error").cast("long")).as("x"))
      .withColumn("p", $"x".cast("double") / $"n")
      .withColumn("ctr", ($"p" + z2 / (lit(2.0) * $"n")) / (lit(1.0) + z2 / $"n"))
      .withColumn("half",
        (lit(z) * sqrt($"p" * (lit(1.0) - $"p") / $"n" +
          z2 / (lit(4.0) * $"n" * $"n"))) / (lit(1.0) + z2 / $"n"))
      .select($"d", $"n", $"x",
        floor($"p" * lit(1e6) + lit(0.5)).cast("long").as("rate_micro"),
        floor(($"ctr" - $"half") * lit(1e6) + lit(0.5)).cast("long").as("lo_micro"),
        floor(($"ctr" + $"half") * lit(1e6) + lit(0.5)).cast("long").as("hi_micro"))
      .orderBy($"d")
  }

  private def aggEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // two consumers (totals + the proportion join) — pin the bounded
    // (source × lang) reduction so the corpus scans ONCE
    val cells = Materialize.once(
      Tables.documents(spark, sfDir)
        .groupBy($"source", $"lang")
        .agg(count(lit(1)).as("n")))
    val totals = cells.groupBy($"source")
      .agg(sum($"n").as("n_docs"), count(lit(1)).as("n_langs"))
    cells.join(broadcast(totals), Seq("source"))
      .withColumn("p", $"n".cast("double") / $"n_docs")
      .groupBy($"source")
      .agg(
        first($"n_docs").as("n_docs"),
        first($"n_langs").as("n_langs"),
        pround(-sum($"p" * log($"p")), 6).as("entropy"),
        pround(when(first($"n_langs") > 1,
          -sum($"p" * log($"p")) / log(first($"n_langs").cast("double"))), 6)
          .as("entropy_norm"),
        pround(lit(1.0) - sum($"p" * $"p"), 6).as("gini"))
      .orderBy($"source")
  }

  override def queries: Map[String, QueryFn] = Map(
    "agg_entropy"      -> aggEntropy,
    "agg_rate_ci"      -> aggRateCi,
    "agg_bool"         -> aggBool,
    "agg_stats"        -> aggStats,
    "agg_skew_kurt"    -> aggSkewKurt,
    "agg_regr"         -> aggRegr,
    "agg_mode_median"  -> aggModeMedian,
    "agg_string_agg"   -> aggStringAgg,
    "agg_grouping_id"  -> aggGroupingId,
    "agg_width_bucket" -> aggWidthBucket,
    "agg_bitwise"      -> aggBitwise
  )

  override def oracles: Map[String, String] = Map(
    "agg_rate_ci" ->
      """WITH c AS (
        |  SELECT CAST(ts AS DATE) AS d, count(*) AS n,
        |         CAST(sum(CAST(event_type = 'error' AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT d, n, x, CAST(x AS DOUBLE) / n AS p,
        |         (CAST(x AS DOUBLE) / n + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (2.0 * n)) /
        |           (1.0 + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / n) AS ctr,
        |         (CAST(1.96 AS DOUBLE) * sqrt((CAST(x AS DOUBLE) / n) * (1.0 - CAST(x AS DOUBLE) / n) / n +
        |                      CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (4.0 * n * n))) /
        |           (1.0 + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / n) AS half
        |  FROM c)
        |SELECT d, n, x,
        |       CAST(floor(p * 1e6 + 0.5) AS BIGINT) AS rate_micro,
        |       CAST(floor((ctr - half) * 1e6 + 0.5) AS BIGINT) AS lo_micro,
        |       CAST(floor((ctr + half) * 1e6 + 0.5) AS BIGINT) AS hi_micro
        |FROM w ORDER BY d""".stripMargin,
    "agg_entropy" ->
      """WITH cells AS (
        |  SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
        |t AS (SELECT source, sum(n) AS n_docs, count(*) AS n_langs
        |      FROM cells GROUP BY 1),
        |p AS (SELECT cells.source, CAST(n AS DOUBLE) / n_docs AS p,
        |             n_docs, n_langs
        |      FROM cells JOIN t USING (source))
        |SELECT source,
        |  CAST(max(n_docs) AS BIGINT) AS n_docs,
        |  CAST(max(n_langs) AS BIGINT) AS n_langs,
        |  floor(-sum(p * ln(p)) * 1e6 + 0.5) / 1e6 AS entropy,
        |  CASE WHEN max(n_langs) > 1 THEN
        |    floor(-sum(p * ln(p)) / ln(CAST(max(n_langs) AS DOUBLE)) * 1e6 + 0.5) / 1e6
        |  END AS entropy_norm,
        |  floor((1 - sum(p * p)) * 1e6 + 0.5) / 1e6 AS gini
        |FROM p GROUP BY source ORDER BY source""".stripMargin,
    "agg_bool" ->
      """SELECT event_type,
        |  count(*) FILTER (WHERE value > 100) AS n_big,
        |  count(*) FILTER (WHERE value IS NULL) AS n_null,
        |  bool_and(value IS NOT NULL) AS all_present,
        |  bool_or(value > 500) AS any_huge
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_stats" ->
      """SELECT l_returnflag,
        |  floor(stddev_samp(l_quantity) * 1e6 + 0.5) / 1e6 AS sd_samp,
        |  floor(stddev_pop(l_quantity) * 1e6 + 0.5) / 1e6 AS sd_pop,
        |  floor(var_samp(l_quantity) * 1e6 + 0.5) / 1e6 AS v_samp,
        |  floor(var_pop(l_quantity) * 1e6 + 0.5) / 1e6 AS v_pop,
        |  floor(corr(l_quantity, l_extendedprice) * 1e6 + 0.5) / 1e6 AS qp_corr,
        |  floor(covar_samp(l_quantity, l_extendedprice) * 1e4 + 0.5) / 1e4 AS qp_covar,
        |  floor(covar_pop(l_quantity, l_extendedprice) * 1e4 + 0.5) / 1e4 AS qp_covar_pop
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_skew_kurt" ->
      """WITH mu AS (
        |  SELECT l_linestatus, avg(l_extendedprice) AS m
        |  FROM lineitem GROUP BY l_linestatus),
        |mom AS (
        |  SELECT l.l_linestatus,
        |         avg((l_extendedprice - m) * (l_extendedprice - m)) AS m2,
        |         avg(pow(l_extendedprice - m, 3)) AS m3,
        |         avg(pow(l_extendedprice - m, 4)) AS m4
        |  FROM lineitem l JOIN mu ON l.l_linestatus = mu.l_linestatus
        |  GROUP BY l.l_linestatus)
        |SELECT l_linestatus,
        |  floor((m3 / pow(m2, 1.5)) * 1e6 + 0.5) / 1e6 AS sk,
        |  floor((m4 / (m2 * m2) - 3) * 1e6 + 0.5) / 1e6 AS ku
        |FROM mom ORDER BY l_linestatus""".stripMargin,
    "agg_regr" ->
      """SELECT l_returnflag,
        |  floor(regr_slope(l_extendedprice, l_quantity) * 1e6 + 0.5) / 1e6 AS slope,
        |  floor(regr_intercept(l_extendedprice, l_quantity) * 1e4 + 0.5) / 1e4 AS intercept,
        |  floor(regr_r2(l_extendedprice, l_quantity) * 1e6 + 0.5) / 1e6 AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
        |  floor(regr_avgx(l_extendedprice, l_quantity) * 1e6 + 0.5) / 1e6 AS avgx,
        |  floor(regr_avgy(l_extendedprice, l_quantity) * 1e4 + 0.5) / 1e4 AS avgy
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_mode_median" ->
      """SELECT l_linestatus, mode(l_returnflag) AS mode_flag,
        |  floor(median(l_quantity) * 1e4 + 0.5) / 1e4 AS med_qty,
        |  floor(median(l_extendedprice) * 1e4 + 0.5) / 1e4 AS med_price
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "agg_string_agg" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "agg_grouping_id" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin,
    "agg_width_bucket" ->
      """SELECT CAST(CASE WHEN l_quantity < 0 THEN 0
        |            WHEN l_quantity >= 50 THEN 11
        |            ELSE floor(l_quantity / 5) + 1 END AS BIGINT) AS bucket,
        |       count(*) AS n,
        |       floor(sum(l_quantity) * 100 + 0.5) / 100 AS qty
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,
    "agg_bitwise" ->
      """SELECT l_returnflag,
        |  CAST(bit_and(l_linenumber) AS BIGINT) AS b_and,
        |  CAST(bit_or(l_linenumber) AS BIGINT) AS b_or,
        |  CAST(bit_xor(l_linenumber) AS BIGINT) AS b_xor
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
