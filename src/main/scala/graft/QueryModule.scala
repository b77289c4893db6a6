package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of declared queries (driver contract, `SparkEntry`) plus their
  * DuckDB oracle SQL. Every key in `oracles` must exist in `queries`; keys in
  * `queries` without an oracle get the driver's weaker rows-only check
  * (reserved for ops whose semantics DuckDB can't reproduce, e.g. approx
  * sketches / MinHash).
  *
  * Determinism contract (SURVEY.md §5): every query ends in a total-order
  * `ORDER BY` over a unique key combination, doubles that pass through
  * re-orderable aggregation are rounded in BOTH dialects, and computed
  * integer columns are cast to BIGINT on the Spark side to match DuckDB's
  * wider defaults.
  */
trait QueryModule {
  type QueryFn = (SparkSession, String) => DataFrame
  def queries: Map[String, QueryFn]
  def oracles: Map[String, String]
}
