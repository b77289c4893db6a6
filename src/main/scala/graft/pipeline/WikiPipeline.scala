package graft.pipeline

import graft.curate.Curate
import graft.schema.WikiSchemas
import graft.upsert.KeepLatest
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's daily pipeline as one library call (SURVEY.md §3 /
  * `dag/wiki_pipeline_dag.py`): what Airflow orchestrates across five
  * serial tasks — crawler → Glue curate → MSCK → Athena CTAS → RDS upsert —
  * is a single in-process Spark job here.
  *
  * DAG-task mapping:
  *  - `wiki_crawler` (schema sync)        → explicit schema / saveAsTable
  *  - `glue_curate` (`job_wiki_curate.py`)→ [[runCurate]]
  *  - `msck_repair` (`dag:83-89`)         → `recoverPartitions` in [[runCurate]]
  *  - `ctas_daily_top_titles` (`dag:29-39`)→ [[runDailyAggregate]]
  *  - `load_rds_top_editors` (`upsert_athena_aggregates.py`) → [[runUpsert]]
  *
  * Idempotency contract matches the reference (`README.md:117`,
  * `upsert:9-13`): re-running any day is safe — curate appends to an
  * immutable raw-derived layout keyed by event time, the aggregate is a
  * deterministic recompute of one day-slice, and the upsert keeps-latest
  * per (dt, editor) under dynamic partition overwrite.
  *
  * Scale notes (100 TB/day): each stage is one bounded day-slice —
  * partition pruning limits every read to the target day; the aggregate
  * shuffles pre-combined partial counts; the upsert rewrites only the
  * touched `dt` partition.
  */
object WikiPipeline {

  /** Curate one day of raw gzip NDJSON into the partitioned lakehouse
    * (`glue/job_wiki_curate.py` parity + MSCK). Returns curated row count. */
  def runCurate(spark: SparkSession, rawDir: String, curatedDir: String): Long = {
    import spark.implicits._
    val parsed = spark.read
      .schema(WikiSchemas.raw)
      .option("mode", "DROPMALFORMED")
      .json(rawDir)
      .filter($"id".isNotNull)
      .withColumn("minor", coalesce($"minor", lit(false)))
    val curated = Curate.curateEpoch(parsed)
    Curate.writeCurated(curated, curatedDir, SaveMode.Append)
    spark.read.parquet(curatedDir).count()
  }

  /** [[runCurate]] routed through the versioned table format (round-11
    * verdict task 3): the same yyyy/mm/dd Hive layout, but the write is a
    * TRANSACTIONAL partitioned append
    * ([[graft.table.GraftTable.appendPartitioned]]) — each daily run
    * commits one table version whose manifest records every file's
    * partition values, so the MSCK step disappears (nothing to repair:
    * the manifest IS the partition index), day-slice reads prune on the
    * manifest instead of a directory listing, and a crashed curate run
    * leaves no torn half-written day visible to readers. Re-running a
    * day appends a new version — the increment is exactly
    * `changesBetween(v-1, v)`. Returns the committed version. */
  def runCurateTable(spark: SparkSession, rawDir: String, tableRoot: String): Long = {
    import spark.implicits._
    val parsed = spark.read
      .schema(WikiSchemas.raw)
      .option("mode", "DROPMALFORMED")
      .json(rawDir)
      .filter($"id".isNotNull)
      .withColumn("minor", coalesce($"minor", lit(false)))
    val curated = Curate.curateEpoch(parsed)
    val t = new java.io.File(tableRoot, "_graft_log").exists() match {
      case true => graft.table.GraftTable.forPath(spark, tableRoot)
      case false => return graft.table.GraftTable
        .createPartitioned(spark, tableRoot, curated, Seq("yyyy", "mm", "dd"),
          operation = "curate").latestVersion
    }
    t.appendPartitioned(curated, Seq("yyyy", "mm", "dd"), operation = "curate")
  }

  /** The daily CTAS: (ds, title, user) edit counts for one target date
    * over the curated layout (partition-pruned scan). */
  def runDailyAggregate(spark: SparkSession, curatedDir: String,
                        targetDate: java.time.LocalDate): DataFrame = {
    import spark.implicits._
    spark.read.parquet(curatedDir)
      .filter($"yyyy" === targetDate.getYear &&
        $"mm" === targetDate.getMonthValue &&
        $"dd" === targetDate.getDayOfMonth)
      .groupBy(to_date($"ts").as("ds"), $"title", $"user")
      .agg(count(lit(1)).as("edits"))
  }

  /** The serving-store upsert: top editors for the day merged into a
    * dt-partitioned table, keep-latest per (dt, username) — the
    * `INSERT ... ON CONFLICT DO UPDATE` analog. */
  def runUpsert(spark: SparkSession, dailyAgg: DataFrame, servingDir: String): Unit = {
    import spark.implicits._
    val topEditors = dailyAgg
      .groupBy($"ds".as("dt"), $"user".as("username"))
      .agg(sum($"edits").as("edits"))
      .withColumn("__v", current_timestamp())
    val existing =
      if (new java.io.File(servingDir).exists)
        spark.read.parquet(servingDir)
      else topEditors.limit(0)
    KeepLatest.upsertPartitions(existing, topEditors, servingDir,
      keys = Seq("dt", "username"), ordering = Seq(col("__v").desc),
      partitionCols = Seq("dt"))
  }

  /** The full daily run (the DAG's five serial tasks). */
  def runDaily(spark: SparkSession, rawDir: String, curatedDir: String,
               servingDir: String, targetDate: java.time.LocalDate): DataFrame = {
    runCurate(spark, rawDir, curatedDir)
    val agg = runDailyAggregate(spark, curatedDir, targetDate)
    runUpsert(spark, agg, servingDir)
    spark.read.parquet(servingDir)
  }
}
