package graft.rel

import graft.{QueryModule, Tables}
import graft.functions.PortableRound.pround
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-format source/sink round-trips (SURVEY.md §2.1 extension).
  *
  * The reference moves the same events through FOUR physical formats —
  * SSE JSON text → Kafka JSON → gzip NDJSON → Parquet
  * (`kafka/wiki-producer.py:77`, `kafka/wiki-s3-consumer.py:43-53`,
  * `glue/job_wiki_curate.py:32,44-51`) — so format-conversion fidelity is a
  * first-class capability, not an afterthought. `scan_json_infer`
  * (ScanFilter) covers the NDJSON leg; this module covers the remaining
  * built-in columnar/text formats a lakehouse migration touches: CSV (the
  * universal interchange format), ORC (the other columnar table format
  * Athena/Hive speak), and plain text lines.
  *
  * Each query writes a deterministic slice of a fixture table to a scratch
  * directory in the target format, reads it back, and aggregates; the DuckDB
  * oracle runs the SAME aggregate directly over the parquet fixture, so a
  * hash match proves the round-trip is value-exact (doubles survive via
  * shortest-round-trip string rendering in CSV; ORC is binary-exact).
  *
  * Scale notes (100 TB): format conversion is an embarrassingly parallel
  * map — each task writes/reads its own file, no shuffle. The things that
  * break at scale are (a) schema inference re-scanning the input (we pass an
  * explicit schema on re-read — inference is exercised separately by
  * `scan_json_infer`) and (b) tiny-file explosion (handled by
  * `Curate.compact`). The `coalesce(4)` here bounds file count for the
  * local fixture only; a cluster job would size files via
  * `spark.sql.files.maxRecordsPerFile`.
  */
object Formats extends QueryModule {

  private def scratch(kind: String, sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_fmt_${kind}_${sfDir.hashCode.toHexString}"

  /** Deterministic ~5% slice of lineitem — big enough to exercise real IO,
    * small enough to keep the bench write bounded. */
  private def slice(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter(pmod($"l_orderkey", lit(20)) === 0)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice",
        $"l_returnflag", $"l_shipdate")
  }

  private val sliceSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_shipdate", TimestampType)))

  private def summarize(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        pround(sum($"l_quantity"), 2).as("sum_qty"),
        pround(sum($"l_extendedprice"), 2).as("sum_price"),
        min($"l_shipdate").as("min_ship"),
        max($"l_shipdate").as("max_ship"))
      .orderBy($"l_returnflag")
  }

  private val summarizeOracle =
    """SELECT l_returnflag,
      |  count(*) AS n,
      |  floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
      |  floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_price,
      |  min(l_shipdate) AS min_ship,
      |  max(l_shipdate) AS max_ship
      |FROM lineitem
      |WHERE l_orderkey % 20 = 0
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** CSV round-trip: write with header, re-read with an explicit schema and
    * the same timestamp format Spark wrote. Doubles survive because Spark
    * renders them shortest-round-trip. */
  private def scanCsv(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = scratch("csv", sfDir)
    slice(spark, sfDir)
      .coalesce(4)
      .write.mode("overwrite").option("header", "true").csv(dir)
    summarize(spark.read.schema(sliceSchema).option("header", "true").csv(dir))
  }

  /** ORC round-trip — binary-exact columnar sibling of the parquet path. */
  private def scanOrc(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = scratch("orc", sfDir)
    slice(spark, sfDir).coalesce(4).write.mode("overwrite").orc(dir)
    summarize(spark.read.orc(dir))
  }

  /** XML round-trip — Spark 4 ships the (formerly spark-xml) datasource
    * built-in: one row per rowTag element, timestamps as ISO-8601 strings,
    * doubles via shortest-round-trip rendering (same fidelity contract as
    * CSV). */
  private def scanXml(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = scratch("xml", sfDir)
    slice(spark, sfDir).coalesce(4)
      .write.mode("overwrite").option("rowTag", "row").xml(dir)
    summarize(spark.read.schema(sliceSchema).option("rowTag", "row").xml(dir))
  }

  /** Plain-text-lines round-trip: `documents.text` out via the text sink,
    * back via the text source (the rawest ingest shape — one record per
    * line, exactly how the reference's SSE `data:` frames arrive,
    * `kafka/wiki-producer.py:33-65`). Line order is not preserved across
    * files, so the verdict aggregates order-insensitively: per-line token
    * counts re-aggregated into a global histogram-ish summary. */
  private def scanText(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = scratch("txt", sfDir)
    // The text sink writes one LINE per record: an embedded \n or \r would
    // split a document into several lines on read-back, so sanitize to keep
    // the doc↔line mapping 1:1 (the oracle applies the same replacement).
    Tables.documents(spark, sfDir)
      .select(regexp_replace($"text", "[\\n\\r]", " ").as("text"))
      .coalesce(4)
      .write.mode("overwrite").text(dir)
    spark.read.text(dir)
      .select(size(split($"value", " ")).cast("long").as("n_tokens"),
        length($"value").cast("long").as("n_chars"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum($"n_tokens").as("total_tokens"),
        sum($"n_chars").as("total_chars"),
        min($"n_tokens").as("min_tokens"),
        max($"n_tokens").as("max_tokens"))
  }

  /** Schema evolution on read: a column ADDED mid-stream (the commonest
    * lakehouse schema change — the reference's Glue crawler re-infers the
    * landed schema every run for exactly this reason). Batch 1 lands
    * (orderkey, quantity); batch 2 adds `l_extendedprice`;
    * `mergeSchema=true` unifies on read with nulls for the pre-evolution
    * rows, and the aggregate proves value-level fidelity for both eras.
    * At 100 TB mergeSchema is a FOOTER-only operation (no data rewrite,
    * one footer read per file — the reason additive evolution is free in
    * parquet lakehouses, and exactly what a full-table CTAS migration
    * would cost instead). */
  private def scanSchemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = scratch("evo", sfDir)
    val li = Tables.lineitem(spark, sfDir)
    li.filter(pmod($"l_orderkey", lit(20)) === 0)
      .select($"l_orderkey", $"l_quantity")
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/b1")
    li.filter(pmod($"l_orderkey", lit(20)) === 10)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/b2")
    spark.read.option("mergeSchema", "true").parquet(s"$dir/b1", s"$dir/b2")
      .agg(
        count(lit(1)).as("n_rows"),
        sum($"l_extendedprice".isNotNull.cast("long")).as("n_with_price"),
        pround(sum($"l_quantity"), 2).as("sum_qty"),
        // exact cent-unit sum (null-safe: round(null)=null, sum skips it) —
        // the double form crossed the 0.01 quantum at 100×; see Aggs.aggMulti
        (sum(round($"l_extendedprice" * 100).cast("long")) / lit(100.0))
          .as("sum_price"))
  }

  override def queries: Map[String, QueryFn] = Map(
    "scan_csv_roundtrip" -> scanCsv,
    "scan_orc_roundtrip" -> scanOrc,
    "scan_xml_roundtrip" -> scanXml,
    "scan_text_roundtrip" -> scanText,
    "scan_schema_evolution" -> scanSchemaEvolution
  )

  override def oracles: Map[String, String] = Map(
    "scan_csv_roundtrip" -> summarizeOracle,
    "scan_orc_roundtrip" -> summarizeOracle,
    "scan_xml_roundtrip" -> summarizeOracle,
    "scan_schema_evolution" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN l_orderkey % 20 = 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_with_price,
        |  floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
        |  CAST(sum(CASE WHEN l_orderkey % 20 = 10 THEN
        |             CAST(round(l_extendedprice * 100) AS BIGINT) END) AS BIGINT)
        |    / 100.0 AS sum_price
        |FROM lineitem
        |WHERE l_orderkey % 20 IN (0, 10)""".stripMargin,
    "scan_text_roundtrip" ->
      """WITH t AS (
        |  SELECT replace(replace(text, chr(13), ' '), chr(10), ' ') AS text
        |  FROM documents)
        |SELECT count(*) AS n_lines,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(sum(len(text)) AS BIGINT) AS total_chars,
        |  min(len(string_split(text, ' '))) AS min_tokens,
        |  max(len(string_split(text, ' '))) AS max_tokens
        |FROM t""".stripMargin
  )
}
