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

  /** Partitioned parquet append (`glue/job_wiki_curate.py:44-51`). */
  def writeCurated(curated: DataFrame, path: String,
                   mode: SaveMode = SaveMode.Append,
                   singleFile: Boolean = false): Unit = {
    val df = if (singleFile) curated.repartition(1) else curated
    df.write.mode(mode).partitionBy("yyyy", "mm", "dd").parquet(path)
  }
}
