package graft.rel

import graft.{QueryModule, Tables}
import graft.functions.PortableRound.pround
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality operators: a per-column statistical profile and a
  * declarative constraint suite, both over the event stream.
  *
  * The reference enforces quality only implicitly — the SSE producer drops
  * non-`message` frames and back-fills absent fields with `.get` defaults
  * (`kafka/wiki-producer.py:74-90`), and the Glue crawler re-infers schema
  * each run. A lakehouse feeding a 100 TB training pipeline needs those
  * checks as first-class, queryable operators (the Deequ/Great-Expectations
  * role): profile every landed partition, gate downstream jobs on
  * constraint results.
  *
  * Scale shape (100 TB):
  *  - BOTH operators are a SINGLE full scan feeding one partial+final
  *    aggregation — no per-column re-scan (a naive per-column UNION of six
  *    profile queries reads the table six times; here the six column
  *    profiles are six aggregate groups over one pass).
  *  - The profile's multiple exact `count(DISTINCT col)`s make Catalyst
  *    plan an Expand (one duplicated row per distinct-aggregate), trading
  *    a 6× shuffle-row blowup for the single scan — the standard plan.
  *    At 100 TB swap `countDistinct` for `approx_count_distinct` and the
  *    Expand collapses to mergeable HLL partials — that form ships as the
  *    declared query `dq_profile_approx` ([[dqProfileApprox]]); exact is
  *    kept here because the driver's oracle hash-compares values.
  *  - Constraint evaluation is pure map-side `sum(CASE …)` partials —
  *    bytes shuffled = one row per partition regardless of input size.
  *  - Fixture caveat (not a plan property): the driver's sf0.1 events
  *    parquet is ONE row group, and row groups are atomic scan splits —
  *    so the profile's map stage runs single-task here (~5 s). The same
  *    plan over the 10× probe's 32-file input runs 3.4 s: the map work
  *    parallelizes with the input layout, which any real table provides.
  */
object DataQuality extends QueryModule {

  /** Per-column profile of `events`: null count, exact distinct count,
    * min/max (numeric columns as doubles — timestamps via epoch-micros,
    * which stay exact in a double up to year ~2255; string columns
    * lexicographic). One row per column, fixed schema across types. */
  private def dqProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .withColumn("ts_us", expr("unix_micros(cast(ts as timestamp))"))
    // Unpivot FIRST (the dq_uniqueness trick): six count(DISTINCT col) in
    // one aggregate make Catalyst Expand-duplicate every event row once
    // per distinct aggregate (6× shuffle volume, two shuffle stages of
    // it). Stacking to (col, vnum, vstr, isnull) rows carries the same
    // data ONCE, and the single remaining countDistinct plans as the
    // ordinary two-level distinct aggregation — partial (col, value)
    // reduce map-side, no Expand. Numeric columns canonicalize to DOUBLE
    // (event_id/user_id/ts_us are all < 2^53 — exact), string columns
    // ride vstr; the struct(vnum, vstr) distinct key is null-gated by
    // isnull so null cells don't count as a value, matching
    // count(DISTINCT col) semantics.
    val un = e.select(expr(
      """stack(6,
        |  'event_id',   cast(event_id as double), CAST(NULL AS STRING), event_id IS NULL,
        |  'ts',         cast(ts_us as double),    CAST(NULL AS STRING), ts IS NULL,
        |  'user_id',    cast(user_id as double),  CAST(NULL AS STRING), user_id IS NULL,
        |  'value',      value,                    CAST(NULL AS STRING), value IS NULL,
        |  'event_type', CAST(NULL AS DOUBLE),     event_type,           event_type IS NULL,
        |  'props',      CAST(NULL AS DOUBLE),     props,                props IS NULL)
        |AS (col, vnum, vstr, isnull)""".stripMargin))
    un.groupBy($"col").agg(
        sum($"isnull".cast("long")).as("n_null"),
        countDistinct(when(!$"isnull", struct($"vnum", $"vstr"))).as("n_distinct"),
        min($"vnum").as("min_num"), max($"vnum").as("max_num"),
        min($"vstr").as("min_str"), max($"vstr").as("max_str"))
      .orderBy($"col")
  }

  /** The 100-TB form of [[dqProfile]], promoted from prose to an
    * executable declared query: identical output shape, but every exact
    * `count(DISTINCT col)` becomes `approx_count_distinct` (HLL++,
    * rsd 0.02). The exact form (now unpivot-first, single two-level
    * distinct aggregation — no Expand) still shuffles the distinct-VALUE
    * volume: its partial state is the (col, value) set itself, growing
    * with cardinality. The HLL partials are fixed-size mergeable
    * registers, so the shuffle is ≤ partitions × 6 sketches no matter
    * how many distinct values 100 TB holds — the sketch stays the
    * 100-TB form even after the exact form's round-10 restructure.
    * Oracle-exempt BY
    * DESIGN (HLL estimates differ from DuckDB's); the ±5%-per-column band
    * vs the exact twin is asserted in ApproxContractSpec. */
  private def dqProfileApprox(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .withColumn("ts_us", expr("unix_micros(cast(ts as timestamp))"))
    def nulls(c: String) = sum(col(c).isNull.cast("long"))
    val agg = e.agg(
      nulls("event_id").as("id_nul"), approx_count_distinct($"event_id", 0.02).as("id_dis"),
      min($"event_id").cast("double").as("id_min"), max($"event_id").cast("double").as("id_max"),
      nulls("ts").as("ts_nul"), approx_count_distinct($"ts_us", 0.02).as("ts_dis"),
      min($"ts_us").cast("double").as("ts_min"), max($"ts_us").cast("double").as("ts_max"),
      nulls("user_id").as("us_nul"), approx_count_distinct($"user_id", 0.02).as("us_dis"),
      min($"user_id").cast("double").as("us_min"), max($"user_id").cast("double").as("us_max"),
      nulls("value").as("va_nul"), approx_count_distinct($"value", 0.02).as("va_dis"),
      min($"value").as("va_min"), max($"value").as("va_max"),
      nulls("event_type").as("et_nul"), approx_count_distinct($"event_type", 0.02).as("et_dis"),
      min($"event_type").as("et_min"), max($"event_type").as("et_max"),
      nulls("props").as("pr_nul"), approx_count_distinct($"props", 0.02).as("pr_dis"),
      min($"props").as("pr_min"), max($"props").as("pr_max"))
    agg.select(expr(
      """stack(6,
        |  'event_id',   id_nul, id_dis, id_min, id_max, CAST(NULL AS STRING), CAST(NULL AS STRING),
        |  'ts',         ts_nul, ts_dis, ts_min, ts_max, CAST(NULL AS STRING), CAST(NULL AS STRING),
        |  'user_id',    us_nul, us_dis, us_min, us_max, CAST(NULL AS STRING), CAST(NULL AS STRING),
        |  'value',      va_nul, va_dis, va_min, va_max, CAST(NULL AS STRING), CAST(NULL AS STRING),
        |  'event_type', et_nul, et_dis, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), et_min, et_max,
        |  'props',      pr_nul, pr_dis, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), pr_min, pr_max)
        |AS (col, n_null, n_distinct, min_num, max_num, min_str, max_str)""".stripMargin))
      .orderBy($"col")
  }

  /** Declarative constraint suite over `events`: each rule is a predicate
    * whose violation count is a `sum(CASE …)` in ONE shared aggregation —
    * adding a rule adds a column, never a scan. `value_outlier_cap` is a
    * deliberately-firing threshold rule so the suite demonstrably detects,
    * not just vacuously passes; `event_id_unique` is the one non-map-side
    * rule (needs a distinct count). */
  private def dqConstraints(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def viol(c: org.apache.spark.sql.Column) = sum(c.cast("long"))
    val agg = Tables.eventsSpread(spark, sfDir).agg(
      viol($"value".isNull || $"value" < 0 || $"value" > 1000).as("r_range"),
      viol($"value" > 300).as("r_cap"),
      viol($"event_type".isNull ||
        !$"event_type".isin("click", "view", "purchase", "signup", "error")).as("r_dom"),
      viol($"ts" < lit("2020-01-01").cast("timestamp_ntz") ||
        $"ts" >= lit("2031-01-01").cast("timestamp_ntz")).as("r_ts"),
      viol($"user_id".isNull).as("r_uid"),
      viol(get_json_object($"props", "$.k").isNull).as("r_props"),
      (count(lit(1)) - countDistinct($"event_id")).as("r_uniq"))
    agg.select(expr(
      """stack(7,
        |  'event_id_unique',   r_uniq,
        |  'event_type_domain', r_dom,
        |  'props_has_k',       r_props,
        |  'ts_in_range',       r_ts,
        |  'user_id_not_null',  r_uid,
        |  'value_in_range',    r_range,
        |  'value_outlier_cap', r_cap)
        |AS (rule, n_violations)""".stripMargin))
      .withColumn("passed", $"n_violations" === 0L)
      .orderBy($"rule")
  }

  /** Distribution-drift monitor: Population Stability Index, KL
    * divergence, and total-variation distance of each event type's
    * `value` distribution between the first and second half of the
    * table's time span — the gate a training pipeline runs per ingest
    * batch before letting new data into a shard mix (PSI ≥ 0.2 is the
    * classic "significant shift" rule from credit-risk scorecard
    * monitoring). Fixed 10-wide bins over the domain [0, 1000) plus
    * under/overflow bins; Laplace-smoothed proportions
    * p_i = (n_i + ½)/(N + ½·B) so empty-on-one-side bins contribute a
    * finite, defined penalty instead of ±∞.
    *
    * Scale shape (100 TB): ONE corpus scan — the time midpoint is a
    * 1-row min/max aggregate broadcast back; side + bin assignment are
    * map-local; the scan partial-aggregates straight to
    * (type × bin × {ref,cur}) cells, so the shuffle is bounded by the
    * bin grid (≤ types·12 rows), never by events. The divergence math
    * runs on the bounded cell frame (a broadcast self-join of two tiny
    * aggregates).
    *
    * Determinism: bin counts and totals are exact BIGINTs, so p/q are
    * identical doubles cross-engine; ln differs by ≤1 ulp between
    * libm/JDK and the ≤12-term sums by a few ulps — absorbed by the
    * 1e-6 rounding (the agg_stats convention). */
  private def dqDriftPsi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .filter($"value".isNotNull)
      .withColumn("ts_us", expr("unix_micros(cast(ts as timestamp))"))
    val mid = e.agg((floor((min($"ts_us") + max($"ts_us")) / 2))
      .cast("long").as("mid_us"))
    val binned = e.crossJoin(broadcast(mid))
      .select($"event_type",
        ($"ts_us" < $"mid_us").as("is_ref"),
        when($"value" < 0, 0L)
          .when($"value" >= 1000, 11L)
          .otherwise(floor($"value" / 100).cast("long") + 1).as("bucket"))
    // two consumers (totals + the proportion join) — pin the grid-bounded
    // cell frame so the corpus scans once for cells (plus the 1-row
    // midpoint pass, which is irreducible: binning needs the bounds)
    val cells = Materialize.once(
      binned.groupBy($"event_type", $"bucket")
        .agg(count_if($"is_ref").as("rn"), count_if(!$"is_ref").as("cn")))
    val totals = cells.groupBy($"event_type")
      .agg(sum($"rn").as("r_tot"), sum($"cn").as("c_tot"),
        count(lit(1)).as("n_bins"))
    cells.join(broadcast(totals), Seq("event_type"))
      .withColumn("p", ($"rn" + 0.5) / ($"r_tot" + $"n_bins" * 0.5))
      .withColumn("q", ($"cn" + 0.5) / ($"c_tot" + $"n_bins" * 0.5))
      .groupBy($"event_type")
      .agg(
        first($"r_tot").as("n_ref"), first($"c_tot").as("n_cur"),
        pround(sum(($"p" - $"q") * log($"p" / $"q")), 6).as("psi"),
        pround(sum($"p" * log($"p" / $"q")), 6).as("kl"),
        pround(sum(abs($"p" - $"q")) * 0.5, 6).as("tvd"))
      .withColumn("drifted", $"psi" >= 0.2)
      .orderBy($"event_type")
  }

  private val UniqCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** Candidate-key / uniqueness profile of `orders`: per column, the
    * exact distinct count, null count, uniqueness ratio, and whether the
    * column is a candidate key (unique ∧ non-null) — the schema-discovery
    * primitive (which column can be a merge/upsert key?) that
    * [[dqProfile]]'s stats don't answer directly.
    *
    * Scale shape (100 TB): the DUAL of dqProfile's Expand plan — unpivot
    * FIRST (`stack` is a map-side generator: rows × |cols|, but slim
    * 2-field rows), then ONE (col, value)-keyed aggregation whose partial
    * step collapses duplicates before the shuffle, then a |cols|-keyed
    * rollup of the cells. Multiple exact count-distincts never meet in one
    * aggregate, so no Expand and no per-column re-scan; the shuffle is
    * bounded by Σ per-column cardinality, not rows × aggregates. String
    * casts only need injectivity WITHIN each engine (only counts cross
    * engines), so double/timestamp formatting differences are immaterial. */
  private def dqUniqueness(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val stacked = Tables.ordersSpread(spark, sfDir).select(expr(
      s"stack(${UniqCols.length}, " +
        UniqCols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ") +
        ") AS (col, v)"))
    stacked.groupBy($"col", $"v").agg(count(lit(1)).as("c"))
      .groupBy($"col").agg(
        sum($"c").as("n_rows"),
        coalesce(sum(when($"v".isNull, $"c")), lit(0L)).as("n_nulls"),
        count(when($"v".isNotNull, lit(1))).as("n_distinct"))
      .select($"col", $"n_rows", $"n_nulls", $"n_distinct",
        pround($"n_distinct".cast("double") / $"n_rows", 6).as("uniqueness"),
        ($"n_nulls" === 0 && $"n_distinct" === $"n_rows").as("candidate_key"))
      .orderBy($"col")
  }

  override def queries: Map[String, QueryFn] = Map(
    "dq_profile"     -> dqProfile,
    "dq_profile_approx" -> dqProfileApprox,
    "dq_constraints" -> dqConstraints,
    "dq_drift_psi"   -> dqDriftPsi,
    "dq_uniqueness"  -> dqUniqueness
  )

  override def oracles: Map[String, String] = Map(
    // Unpivot via UNION ALL branches (DuckDB's stack); counts are
    // cast-format-independent, so VARCHAR casts here need not render
    // identically to Spark's.
    "dq_uniqueness" -> {
      val branches = UniqCols.map(c =>
        s"SELECT '$c' AS col, CAST($c AS VARCHAR) AS v FROM orders")
        .mkString("\n  UNION ALL ")
      s"""WITH s AS (
        |  $branches),
        |g AS (SELECT col, v, count(*) AS c FROM s GROUP BY 1, 2)
        |SELECT col, CAST(sum(c) AS BIGINT) AS n_rows,
        |       CAST(coalesce(sum(CASE WHEN v IS NULL THEN c END), 0) AS BIGINT) AS n_nulls,
        |       CAST(count(CASE WHEN v IS NOT NULL THEN 1 END) AS BIGINT) AS n_distinct,
        |       floor(CAST(count(CASE WHEN v IS NOT NULL THEN 1 END) AS DOUBLE)
        |             / sum(c) * 1e6 + 0.5) / 1e6 AS uniqueness,
        |       (coalesce(sum(CASE WHEN v IS NULL THEN c END), 0) = 0
        |        AND count(CASE WHEN v IS NOT NULL THEN 1 END) = sum(c)) AS candidate_key
        |FROM g GROUP BY col ORDER BY col""".stripMargin
    },
    "dq_drift_psi" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, value
        |           FROM events WHERE value IS NOT NULL),
        |m AS (SELECT CAST(floor((min(ts_us) + max(ts_us)) / 2) AS BIGINT)
        |        AS mid_us FROM e),
        |b AS (SELECT event_type, ts_us < mid_us AS is_ref,
        |        CASE WHEN value < 0 THEN 0 WHEN value >= 1000 THEN 11
        |             ELSE CAST(floor(value / 100) AS BIGINT) + 1 END AS bucket
        |      FROM e CROSS JOIN m),
        |cells AS (SELECT event_type, bucket,
        |        count(*) FILTER (WHERE is_ref) AS rn,
        |        count(*) FILTER (WHERE NOT is_ref) AS cn
        |      FROM b GROUP BY 1, 2),
        |t AS (SELECT event_type, sum(rn) AS r_tot, sum(cn) AS c_tot,
        |        count(*) AS n_bins
        |      FROM cells GROUP BY 1),
        |pq AS (SELECT cells.event_type,
        |         (rn + 0.5::DOUBLE) / (r_tot + 0.5::DOUBLE * n_bins) AS p,
        |         (cn + 0.5::DOUBLE) / (c_tot + 0.5::DOUBLE * n_bins) AS q,
        |         r_tot, c_tot
        |       FROM cells JOIN t USING (event_type))
        |SELECT event_type,
        |  CAST(max(r_tot) AS BIGINT) AS n_ref,
        |  CAST(max(c_tot) AS BIGINT) AS n_cur,
        |  floor(sum((p - q) * ln(p / q)) * 1e6 + 0.5) / 1e6 AS psi,
        |  floor(sum(p * ln(p / q)) * 1e6 + 0.5) / 1e6 AS kl,
        |  floor(sum(abs(p - q)) * 0.5 * 1e6 + 0.5) / 1e6 AS tvd,
        |  floor(sum((p - q) * ln(p / q)) * 1e6 + 0.5) / 1e6 >= 0.2 AS drifted
        |FROM pq GROUP BY event_type ORDER BY event_type""".stripMargin,
    "dq_profile" ->
      """WITH e AS (SELECT *, epoch_us(ts) AS ts_us FROM events)
        |SELECT 'event_id' AS col,
        |  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
        |  CAST(min(event_id) AS DOUBLE) AS min_num, CAST(max(event_id) AS DOUBLE) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM e
        |UNION ALL
        |SELECT 'ts',
        |  CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT ts_us) AS BIGINT),
        |  CAST(min(ts_us) AS DOUBLE), CAST(max(ts_us) AS DOUBLE), NULL, NULL FROM e
        |UNION ALL
        |SELECT 'user_id',
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT user_id) AS BIGINT),
        |  CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE), NULL, NULL FROM e
        |UNION ALL
        |SELECT 'value',
        |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT value) AS BIGINT),
        |  min(value), max(value), NULL, NULL FROM e
        |UNION ALL
        |SELECT 'event_type',
        |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT event_type) AS BIGINT),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  min(event_type), max(event_type) FROM e
        |UNION ALL
        |SELECT 'props',
        |  CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT props) AS BIGINT),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  min(props), max(props) FROM e
        |ORDER BY col""".stripMargin,
    "dq_constraints" ->
      """WITH agg AS (SELECT
        |  CAST(sum(CASE WHEN value IS NULL OR value < 0 OR value > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS r_range,
        |  CAST(sum(CASE WHEN value > 300 THEN 1 ELSE 0 END) AS BIGINT) AS r_cap,
        |  CAST(sum(CASE WHEN event_type NOT IN ('click','view','purchase','signup','error')
        |                     OR event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r_dom,
        |  CAST(sum(CASE WHEN ts < TIMESTAMP '2020-01-01' OR ts >= TIMESTAMP '2031-01-01'
        |                THEN 1 ELSE 0 END) AS BIGINT) AS r_ts,
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r_uid,
        |  CAST(sum(CASE WHEN json_extract(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r_props,
        |  CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS r_uniq
        |  FROM events)
        |SELECT rule, n_violations, n_violations = 0 AS passed FROM (
        |  SELECT 'event_id_unique' AS rule,  r_uniq  AS n_violations FROM agg
        |  UNION ALL SELECT 'event_type_domain', r_dom   FROM agg
        |  UNION ALL SELECT 'props_has_k',       r_props FROM agg
        |  UNION ALL SELECT 'ts_in_range',       r_ts    FROM agg
        |  UNION ALL SELECT 'user_id_not_null',  r_uid   FROM agg
        |  UNION ALL SELECT 'value_in_range',    r_range FROM agg
        |  UNION ALL SELECT 'value_outlier_cap', r_cap   FROM agg)
        |ORDER BY rule""".stripMargin
  )
}
