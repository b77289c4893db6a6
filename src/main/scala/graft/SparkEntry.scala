package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every implemented operator module's declared
  * queries (SURVEY.md §2 inventory); `oracleSql` carries the DuckDB
  * equivalents the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** All operator modules contributing declared queries. */
  private def modules: Seq[QueryModule] = Seq(
    agg.DailyAggregates,
    rel.ScanFilter,
    rel.Formats,
    rel.Sketches,
    rel.VariantFns,
    rel.Joins,
    rel.Aggs,
    rel.Windows,
    rel.SortSet,
    rel.ScalarFns,
    rel.Tpch,
    rel.Subqueries,
    rel.StatsAggs,
    rel.TimeSeries,
    rel.Graph,
    rel.Mining,
    rel.DataQuality,
    rel.Layout,
    llm.Dedup,
    llm.Curation,
    llm.Similarity,
    llm.Retrieval,
    llm.Eval,
    llm.Clustering,
    llm.Text,
    llm.Multimodal,
    pipeline.PipelineQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    agg.DailyAggregates.dailyTopTitles(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
