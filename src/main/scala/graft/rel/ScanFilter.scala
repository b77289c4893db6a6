package graft.rel

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scans, projections, and predicate filters — the reference's row-level
  * surface (SURVEY.md §2.1-2.2).
  *
  * Reference evidence: 8-field projection `kafka/wiki-producer.py:81-90`,
  * default-on-absent `minor` (`:89`), event-kind filter (`:74-75`),
  * malformed-JSON drop (`:76-79`), null-safe bot predicate
  * (`upsert_athena_aggregates.py:44`), date-equality predicate
  * (`dag/wiki_pipeline_dag.py:37`), partition-pruning predicate
  * (`README.md:103`), JSON scan with inference (`glue/job_wiki_curate.py:32`).
  *
  * Scale notes (100 TB): every filter here is a deterministic predicate on
  * scan columns, so Catalyst pushes it into the parquet reader
  * (`PushedFilters` in the plan) and projection pruning trims the scan to
  * the selected columns (`ReadSchema`). Nothing shuffles; these stay
  * whole-stage-codegen'd map tasks at any scale.
  */
object ScanFilter extends QueryModule {

  /** S7 — full parquet table scan with total-order output. */
  private def scanParquet(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** S5 — JSON scan + schema inference: round-trip a slice of `events`
    * through gzip NDJSON (the reference's raw zone format,
    * `kafka/wiki-s3-consumer.py:43-53`) and re-read with inference, exactly
    * like `spark.read.json(RAW_PATH)` at `glue/job_wiki_curate.py:32`.
    * No oracle (the inference itself is the operator); rows-only check.
    */
  private def scanJsonInfer(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = s"${sys.props("java.io.tmpdir")}/graft_rawjson_${sfDir.hashCode.toHexString}"
    val projected = Tables.events(spark, sfDir)
      .select($"event_id", $"event_type", $"user_id", $"value", $"props")
    projected
      .orderBy($"event_id").limit(200)
      .coalesce(1)
      .write.mode("overwrite").option("compression", "gzip").json(dir)
    val inferred = spark.read.json(dir)
    // Inference over an EMPTY directory yields an empty schema (a brand-new
    // ingest prefix / empty day at scale) — fall back to the declared event
    // schema instead of failing the whole job. Non-empty input keeps pure
    // inference: that is the operator under test.
    val df = if (inferred.columns.contains("event_id")) inferred
             else spark.read.schema(projected.schema).json(dir)
    df.orderBy($"event_id")
  }

  /** Ext — seeded Bernoulli sampling: the corpus-subsampling primitive of
    * training-data pipelines. Deterministic for a fixed seed + input
    * splits; no oracle (row selection is engine-RNG-specific) — ScanSpec
    * pins determinism across runs. */
  private def scanSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .sample(withReplacement = false, fraction = 0.2, seed = 42L)
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }

  /** P1 — field projection (producer's 8-col projection analog). */
  private def projSelect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_id", $"event_type", $"user_id", $"value")
      .orderBy($"event_id")
  }

  /** P2 — projection with default: `coalesce` over a derived nullable col,
    * mirroring `minor`-defaulting (`kafka/wiki-producer.py:89`). */
  private def projDefaultCoalesce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(
        $"event_id",
        expr("coalesce(nullif(event_type, 'error'), 'none')").as("et"))
      .orderBy($"event_id")
  }

  /** P4 — equality filter (event-kind filter analog). */
  private def filterEq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"value")
      .orderBy($"event_id")
  }

  /** P5 — malformed-record drop: JSON parse yielding null is filtered out,
    * the declarative form of the producer/consumer's try/except-skip. */
  private def filterCorruptJson(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .filter($"k".isNotNull)
      .select($"event_id", $"k")
      .orderBy($"event_id")
  }

  /** P6 — null-safe boolean predicate: `coalesce(flag,false)=false`, the
    * bot filter of `upsert_athena_aggregates.py:44` over a derived
    * nullable boolean. */
  private def filterNullsafeBool(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .withColumn("flag",
        when($"event_type" === "error", lit(null).cast("boolean"))
          .otherwise($"value" > 50))
      .filter(coalesce($"flag", lit(false)) === false)
      .select($"event_id", $"user_id")
      .orderBy($"event_id")
  }

  /** P7 — date-equality predicate (`date(from_unixtime(ts)) = date '...'`). */
  private def filterDateEq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .filter(to_date($"ts") === lit("2024-01-02").cast("date"))
      .select($"event_id", $"user_id")
      .orderBy($"event_id")
  }

  /** P9a — range / BETWEEN predicates. */
  private def filterRange(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_quantity".between(5, 10) &&
        $"l_shipdate" < lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_shipdate")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** P9b — IN-list predicate. */
  private def filterIn(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
      .select($"o_orderkey", $"o_orderpriority")
      .orderBy($"o_orderkey")
  }

  /** P9c — LIKE predicate. */
  private def filterLike(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, sfDir)
      .filter($"p_name".like("%bolt%"))
      .select($"p_partkey", $"p_name")
      .orderBy($"p_partkey")
  }

  override def queries: Map[String, QueryFn] = Map(
    "scan_parquet"          -> scanParquet,
    "scan_json_infer"       -> scanJsonInfer,
    "scan_sample"           -> scanSample,
    "proj_select"           -> projSelect,
    "proj_default_coalesce" -> projDefaultCoalesce,
    "filter_eq"             -> filterEq,
    "filter_corrupt_json"   -> filterCorruptJson,
    "filter_nullsafe_bool"  -> filterNullsafeBool,
    "filter_date_eq"        -> filterDateEq,
    "filter_range"          -> filterRange,
    "filter_in"             -> filterIn,
    "filter_like"           -> filterLike
  )

  override def oracles: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber",
    // Inference is the operator, but the DATA it yields is still exactly
    // checkable: doubles survive the JSON leg via shortest-round-trip
    // rendering, strings/longs verbatim — so the hash gate also proves
    // the inferred TYPES decoded every value bit-exactly.
    "scan_json_infer" ->
      """SELECT event_id, event_type, props, user_id, value FROM events
        |ORDER BY event_id LIMIT 200""".stripMargin,
    "proj_select" ->
      """SELECT event_id, event_type, user_id, value FROM events
        |ORDER BY event_id""".stripMargin,
    "proj_default_coalesce" ->
      """SELECT event_id, coalesce(nullif(event_type, 'error'), 'none') AS et
        |FROM events ORDER BY event_id""".stripMargin,
    "filter_eq" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "filter_corrupt_json" ->
      """SELECT event_id,
        |       TRY_CAST(NULLIF(regexp_extract(props, '"k": *(-?\d+)', 1), '') AS BIGINT) AS k
        |FROM events
        |WHERE TRY_CAST(NULLIF(regexp_extract(props, '"k": *(-?\d+)', 1), '') AS BIGINT) IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "filter_nullsafe_bool" ->
      """SELECT event_id, user_id FROM (
        |  SELECT event_id, user_id,
        |         CASE WHEN event_type = 'error' THEN NULL ELSE value > 50 END AS flag
        |  FROM events)
        |WHERE coalesce(flag, false) = false
        |ORDER BY event_id""".stripMargin,
    "filter_date_eq" ->
      """SELECT event_id, user_id FROM events
        |WHERE CAST(ts AS DATE) = DATE '2024-01-02' ORDER BY event_id""".stripMargin,
    "filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
        |WHERE l_quantity BETWEEN 5 AND 10 AND l_shipdate < TIMESTAMP '1996-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_in" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') ORDER BY o_orderkey""".stripMargin,
    "filter_like" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name LIKE '%bolt%' ORDER BY p_partkey""".stripMargin
  )
}
