package graft.rel

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch / probabilistic-structure surface beyond HLL++
  * (SURVEY.md §2.4 A8 extension; `BASELINE.json` 100-TB design note).
  *
  * At warehouse scale, exact distinct counts and membership tests become the
  * dominant shuffle: `count(distinct x)` expands to a two-phase aggregate
  * whose first phase materializes every distinct value. The three structures
  * here are the standard sub-linear replacements:
  *
  *  - **Roaring-style bitmaps** (`bitmap_construct_agg` family): EXACT
  *    distinct counts with constant-size per-bucket state. Each 32k-wide
  *    bucket aggregates to one bitmap; buckets merge with bitwise OR, so the
  *    shuffle carries (groups × buckets) fixed-size blobs instead of raw
  *    values, and the count is still exact — which is why this one is
  *    DuckDB-oracle-checkable against `count(DISTINCT ...)`.
  *  - **DataSketches HLL** (`hll_sketch_agg` / `hll_union_agg`): mergeable
  *    approximate distinct state — unlike `approx_count_distinct`
  *    (agg_approx_distinct), the sketch itself is a column that can be
  *    stored, re-aggregated, and unioned across days exactly like the
  *    reference's daily CTAS tables get unioned into
  *    `vw_top_titles_by_day` (`dag/wiki_pipeline_dag.py:30`). Estimate is
  *    approximate → rows-only check; SketchesSpec bounds the error vs exact.
  *  - **Bloom filter** (`DataFrameStatFunctions.bloomFilter`): the build
  *    side of a distributed runtime filter — build over the dimension keys,
  *    broadcast, and pre-filter the fact scan before the join shuffle
  *    (exactly what Spark's own runtime row-group filtering does). No false
  *    negatives ever; false-positive rate is configured. Hash-dependent →
  *    rows-only; SketchesSpec asserts zero false negatives and bounds fp.
  */
object Sketches extends QueryModule {

  /** Exact distinct user_ids per event_type via bucketed bitmaps. */
  private def bitmapDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type", expr("bitmap_bucket_number(user_id)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
      .groupBy($"event_type")
      .agg(sum(expr("bitmap_count(bm)")).cast("long").as("n_distinct_users"))
      .orderBy($"event_type")
  }

  /** Mergeable HLL sketches: per-(event_type, day) sketches re-unioned to
    * per-type estimates — the store-then-merge pattern daily pipelines need.
    * Rows-only (approximate); error bounded in SketchesSpec. */
  private def sketchHll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .groupBy($"event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long")
        .as("approx_users"))
      .orderBy($"event_type")
  }

  /** Bloom-filter runtime pre-filter: build over the keys of
    * high-value orders, probe the lineitem scan. `n_true_members` counts
    * probes that are genuine members (no false negatives allowed);
    * `n_hits` ≥ that by exactly the false positives. Rows-only. */
  private def bloomFilter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val keys = Tables.orders(spark, sfDir)
      .filter($"o_totalprice" > 100000.0)
      .select($"o_orderkey")
    // A zero-row build leaves the sketch buffer null (Spark empty-
    // aggregation corner) and the build/probe NPEs — the empty-day case
    // at scale. Detect the empty build EXPLICITLY (head(1) probe) rather
    // than catching the NPE: exception-as-control-flow would silently
    // change behavior if a future Spark returns a valid empty sketch or
    // throws something else. An empty key set has no members, so the
    // correct membership probe is constant false.
    val bfOpt =
      if (keys.isEmpty) None
      else Some(keys.stat.bloomFilter($"o_orderkey", 100000L, 0.01))
    val contains = bfOpt match {
      case Some(bf) =>
        val bcast = spark.sparkContext.broadcast(bf)
        udf((k: Long) => bcast.value.mightContainLong(k))
      case None => udf((_: Long) => false)
    }
    val memberKeys = keys.distinct().withColumnRenamed("o_orderkey", "mk")
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey")
      .withColumn("hit", contains($"l_orderkey"))
      .join(memberKeys, $"l_orderkey" === $"mk", "left_outer")
      .agg(
        count(lit(1)).as("n_probed"),
        sum(when($"hit", 1L).otherwise(0L)).as("n_hits"),
        sum(when($"mk".isNotNull, 1L).otherwise(0L)).as("n_true_members"),
        sum(when($"hit" && $"mk".isNull, 1L).otherwise(0L)).as("n_false_pos"))
  }

  /** Count-min frequency sketch: the heavy-hitter/frequency companion to
    * the HLL (distinct) and bloom (membership) sketches. The built-in
    * `count_min_sketch` aggregate builds and merges partial states
    * distributively (constant ~w·d ints per partition at ANY volume); the
    * read side — "how many of X?" — has no SQL surface, so probing goes
    * through the custom [[graft.functions.CmsEstimateExpr]] native
    * expression. Per-day partial sketches union via the aggregate's own
    * merge; each type's estimate is a broadcast probe of the single
    * merged state. Rows-only (sketch estimates are seed/implementation-
    * specific); SketchFormatSpec asserts the CMS contract: estimate ≥
    * exact, ≤ exact + ε·N. */
  private def sketchCountMin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val sk = e.agg(expr(
      "count_min_sketch(event_type, 0.001d, 0.99d, 1)").as("sk"))
    e.select($"event_type").distinct()
      .crossJoin(broadcast(sk))
      .select($"event_type",
        graft.functions.CmsEstimate.cms_estimate($"sk", $"event_type")
          .as("est_n"))
      .orderBy($"event_type")
  }

  override def queries: Map[String, QueryFn] = Map(
    "agg_bitmap_distinct" -> bitmapDistinct,
    "agg_hll_sketch" -> sketchHll,
    "agg_count_min" -> sketchCountMin,
    "filter_bloom" -> bloomFilter
  )

  override def oracles: Map[String, String] = Map(
    // Bitmaps are exact — the oracle is plain COUNT(DISTINCT).
    "agg_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_distinct_users
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
    // agg_hll_sketch, filter_bloom: approximate / hash-dependent → rows-only.
  )
}
