package graft.curate

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The curate job (SURVEY.md §3.1): raw JSON events → event-time timestamp
  * → calendar partition columns → partitioned Parquet. The Scala
  * restatement of `glue/job_wiki_curate.py:32-51`.
  *
  * Differences from the reference, on purpose:
  *  - no `repartition(1)` (the reference flags it demo-only at
  *    `glue/job_wiki_curate.py:10,46`); file count is governed by AQE
  *    coalescing. A `singleFile` flag reproduces the demo behavior.
  *  - explicit schema option instead of always-infer (SURVEY.md §1.3).
  *
  * Scale notes (100 TB): dynamic-partition parquet write, one task per
  * shuffle partition per calendar partition; partition layout `yyyy/mm/dd`
  * is what makes every downstream day-slice query prune its scan
  * (`README.md:115` — "Parquet + partition pruning keeps queries cheap").
  */
object Curate {

  /** Epoch-seconds curation (`glue/job_wiki_curate.py:35-41`): ts from
    * `from_unixtime(timestamp)`, partition cols from ts. */
  def curateEpoch(raw: DataFrame, tsCol: String = "timestamp"): DataFrame =
    withCalendar(raw.withColumn("ts", to_timestamp(from_unixtime(col(tsCol)))))

  /** Curation for sources that already carry an event-time timestamp
    * column (the driver's `events` table). */
  def curateTs(raw: DataFrame, tsCol: String = "ts"): DataFrame =
    withCalendar(if (tsCol == "ts") raw else raw.withColumn("ts", col(tsCol)))

  private def withCalendar(df: DataFrame): DataFrame =
    df.withColumn("yyyy", year(col("ts")))
      .withColumn("mm", month(col("ts")))
      .withColumn("dd", dayofmonth(col("ts")))

  /** Attach single-pass data-quality metrics to a curate batch via the
    * Observation API: row count, null-timestamp count, and the event-time
    * bounds are accumulated DURING the write — no second scan of the input
    * (at 100 TB a count()+agg() validation pass would re-read everything).
    * Read the metrics from the returned Observation after an action. */
  def observeQuality(df: DataFrame, name: String = "curate_quality")
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col("ts").isNull, 1L).otherwise(0L)).as("n_null_ts"),
      min(col("ts")).as("min_ts"),
      max(col("ts")).as("max_ts"))
    (observed, obs)
  }

  /** Partitioned parquet append (`glue/job_wiki_curate.py:44-51`). */
  def writeCurated(curated: DataFrame, path: String,
                   mode: SaveMode = SaveMode.Append,
                   singleFile: Boolean = false): Unit = {
    val df = if (singleFile) curated.repartition(1) else curated
    df.write.mode(mode).partitionBy("yyyy", "mm", "dd").parquet(path)
  }

  /** Small-file compaction — the operational complement of micro-batched
    * ingest: a 10-second flush interval (`kafka/wiki-s3-consumer.py:23`)
    * lands ~8,640 files/partition/day, and scan planning degrades linearly
    * in file count long before data volume matters. Rewrites every file of
    * a partitioned parquet table into ~`targetBytes` outputs per calendar
    * partition: `maxRecordsPerFile` bounds size from above while
    * `repartition` on the partition columns gives the dynamic writer one
    * shuffle block per partition. Uses dynamic partition overwrite, so a
    * `partitionFilter` compacts ONLY the selected (e.g. just-closed)
    * partitions and leaves the rest untouched — the same incremental,
    * re-run-safe shape as the reference's daily jobs.
    *
    * Returns (filesBefore, filesAfter) for the touched slice. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              partitionCols: Seq[String] = Seq("yyyy", "mm", "dd"),
              partitionFilter: org.apache.spark.sql.Column = lit(true),
              targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    def countFiles(df: DataFrame): Long =
      df.select(input_file_name().as("f")).distinct().count()
    val src = spark.read.parquet(path).filter(partitionFilter)
    val before = countFiles(src) // from the live file listing, pre-snapshot
    // rows per target file, estimated from the slice's average row width
    val bytes = src.queryExecution.optimizedPlan.stats.sizeInBytes
    // snapshot before overwriting: Spark (rightly) refuses to overwrite a
    // path it is also reading, and any recompute-from-source contract
    // (persist/localCheckpoint) is wrong once the source is rewritten —
    // Materialize.snapshot stages the slice to durable storage and reads
    // back, exactly the stage-to-sibling-dir pattern a cluster needs.
    val slice = graft.rel.Materialize.snapshot(src)
    val rows = slice.count()
    val rowsPerFile =
      if (rows == 0 || bytes <= 0) Long.MaxValue
      else (BigInt(rows) * targetBytes / bytes).max(1).toLong
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try slice
      .repartition(partitionCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", rowsPerFile)
      .partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val after = countFiles(spark.read.parquet(path).filter(partitionFilter))
    (before, after)
  }
}
