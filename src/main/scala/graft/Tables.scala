package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Lazy, per-(session, sfDir) cached table loader for the driver-generated
  * parquet fixtures (`TESTDATA.md`): TPC-H-ish star schema + `events`,
  * `documents`, `embeddings`.
  *
  * Caching the `DataFrame` handles (NOT the data) avoids re-reading parquet
  * footers / re-resolving schemas on every declared query — with ~60 queries
  * per `Bench` run the footer reads alone would otherwise dominate the small
  * scale factors. The plans stay fully lazy, so Catalyst still sees the raw
  * `FileSourceScanExec` and pushes filters/projections into the scan.
  *
  * At 100 TB these reads would be a catalog-backed partitioned table; the
  * single-file `spark.read.parquet` here is the local stand-in — all
  * downstream operators only assume "a DataFrame with this schema", so
  * swapping the source is a one-line change.
  */
object Tables {
  private val cache = TrieMap.empty[(SparkSession, String, String), DataFrame]

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, sfDir, name), load(spark, sfDir, name))

  private def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // `events.ts` is parquet TIMESTAMP(NANOS) (FIXTURES.md), which Spark 4
    // rejects outright. Read nanos as raw Long, then truncate to µs NTZ —
    // exactly what DuckDB 1.x does on read (truncation verified), so the
    // oracle sees identical values.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    val tsIsRawNanos = name == "events" &&
      df.schema.find(_.name == "ts")
        .exists(_.dataType == org.apache.spark.sql.types.LongType)
    if (tsIsRawNanos)
      df.withColumn(
        "ts",
        org.apache.spark.sql.functions
          .expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  // Spread variants for MAP-HEAVY consumers ([[graft.rel.Spread.narrow]]):
  // identical rows, but a degenerate-narrow scan (the fixtures are one
  // parquet row group — an atomic split, so every fused map expression
  // otherwise serializes on one core) is hash-spread on the row key across
  // the session's cores first. A no-op whenever the scan already splits
  // (production layouts; the gate compares splits to cores), so callers
  // pay the extra exchange exactly when it buys map parallelism. Use the
  // plain accessors when the first downstream op is already an exchange or
  // the query is scan-metadata-bound (counts, pushdown probes).
  private def spreadOn(df: DataFrame, key: String): DataFrame =
    graft.rel.Spread.narrow(df, org.apache.spark.sql.functions.col(key))
  def ordersSpread(s: SparkSession, d: String): DataFrame =
    spreadOn(orders(s, d), "o_orderkey")
  def lineitemSpread(s: SparkSession, d: String): DataFrame =
    spreadOn(lineitem(s, d), "l_orderkey")
  def eventsSpread(s: SparkSession, d: String): DataFrame =
    spreadOn(events(s, d), "event_id")
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    spreadOn(documents(s, d), "doc_id")
  def embeddingsSpread(s: SparkSession, d: String): DataFrame =
    spreadOn(embeddings(s, d), "vec_id")
}
