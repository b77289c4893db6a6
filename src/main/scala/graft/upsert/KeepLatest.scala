package graft.upsert

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent upsert without a table format (SURVEY.md §2.1 S11): the
  * reference's `INSERT ... ON CONFLICT (dt,username) DO UPDATE`
  * (`upsert_athena_aggregates.py:87-110`) re-expressed as keep-latest-
  * per-key + dynamic partition overwrite (no Delta jar in this
  * environment, so `MERGE INTO` is emulated).
  *
  * Scale notes (100 TB): keep-latest is one shuffle on the key columns
  * (window row_number), and the overwrite touches ONLY the partitions
  * present in the incoming batch (`partitionOverwriteMode=dynamic`) — the
  * incremental-day upsert pattern of the reference (re-run-safe,
  * `upsert_athena_aggregates.py:9-13`).
  */
object KeepLatest {

  /** Keep exactly one row per key: the first under `ordering` (pass
    * `desc` columns for "latest"). Deterministic given a total ordering. */
  def keepLatest(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Merge an incoming batch into a partitioned parquet table, replacing
    * only the partitions the batch touches: union existing rows of those
    * partitions with the batch, keep-latest per key, dynamic-overwrite. */
  def upsertPartitions(existing: DataFrame, batch: DataFrame, path: String,
                       keys: Seq[String], ordering: Seq[Column],
                       partitionCols: Seq[String]): Unit = {
    // Materialize before overwriting: `existing` reads the same path we are
    // about to rewrite. A transactional table format makes this snapshot
    // isolation; without one (no Delta jar here) the merge is staged to
    // durable storage (Materialize.snapshot) — a recompute-from-source
    // contract would re-read the overwritten path.
    val merged = graft.rel.Materialize.snapshot(
      keepLatest(existing.unionByName(batch), keys, ordering))
    val spark = batch.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
