package graft.rel

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery / lateral / recursive-CTE surface — the SQL entry point the
  * reference delegates to Athena (`upsert_athena_aggregates.py:39-50` is
  * already a CTE query; `README.md:95-110` ships raw SQL). Everything here
  * goes through `spark.sql` so Catalyst's analyzer handles decorrelation.
  *
  * Scale notes (100 TB):
  *  - IN / EXISTS subqueries decorrelate to left-semi joins; the correlated
  *    scalar subquery (Q17 shape) decorrelates to an aggregate + equi-join —
  *    no per-row re-execution, ever.
  *  - LATERAL with a correlated aggregate becomes a DomainJoin and then a
  *    plain aggregate⋈join after rewrite: same cost model as a hand-written
  *    groupBy + join.
  *  - The recursive CTE is driver-iterated unions of small frames (Spark 4
  *    `UnionLoop`); keep recursion depth/width bounded (here: 12 rows).
  */
object Subqueries extends QueryModule {

  private def withViews(spark: SparkSession, sfDir: String): Unit = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("g_orders")
    Tables.customer(spark, sfDir).createOrReplaceTempView("g_customer")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("g_lineitem")
  }

  /** NOT IN over a NULLABLE subquery column → Catalyst's null-aware anti
    * join (a single NULL in the subquery makes every NOT IN UNKNOWN, so a
    * plain anti join would be WRONG; Spark plans a null-aware
    * BroadcastHashJoin for the single-column case). NULLIF keeps the
    * column nullable (forcing the null-aware plan) while never actually
    * null (keeping the result equal to the plain NOT IN, which DuckDB
    * replays). */
  private def subNotIn(spark: SparkSession, sfDir: String): DataFrame = {
    withViews(spark, sfDir)
    spark.sql(
      """SELECT c_custkey, c_name FROM g_customer
        |WHERE c_custkey NOT IN
        |  (SELECT nullif(o_custkey, -1) FROM g_orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Uncorrelated IN subquery → left-semi join after rewrite. */
  private def subIn(spark: SparkSession, sfDir: String): DataFrame = {
    withViews(spark, sfDir)
    spark.sql(
      """SELECT c_custkey, c_name FROM g_customer
        |WHERE c_custkey IN (SELECT o_custkey FROM g_orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Correlated EXISTS → decorrelated semi join with the extra predicate. */
  private def subExists(spark: SparkSession, sfDir: String): DataFrame = {
    withViews(spark, sfDir)
    spark.sql(
      """SELECT c_custkey, c_name FROM g_customer c
        |WHERE EXISTS (SELECT 1 FROM g_orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'F' AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Uncorrelated scalar subquery (global avg) in a predicate. */
  private def subScalar(spark: SparkSession, sfDir: String): DataFrame = {
    withViews(spark, sfDir)
    spark.sql(
      """SELECT o_orderkey, o_totalprice FROM g_orders
        |WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM g_orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Correlated scalar subquery (TPC-H Q17 shape): per-key average computed
    * once via decorrelation, not per row. */
  private def subScalarCorr(spark: SparkSession, sfDir: String): DataFrame = {
    withViews(spark, sfDir)
    spark.sql(
      """SELECT l_partkey, count(*) AS n_small
        |FROM g_lineitem l1
        |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
        |                    FROM g_lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        |GROUP BY l_partkey
        |ORDER BY l_partkey""".stripMargin)
  }

  /** LATERAL correlated aggregate subquery per outer row. */
  private def joinLateral(spark: SparkSession, sfDir: String): DataFrame = {
    withViews(spark, sfDir)
    spark.sql(
      """SELECT o_orderkey, l.n_items, l.max_qty
        |FROM g_orders,
        |LATERAL (SELECT count(*) AS n_items, max(l_quantity) AS max_qty
        |         FROM g_lineitem WHERE l_orderkey = o_orderkey) l
        |WHERE o_totalprice > 450000
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Recursive CTE (Spark 4 `WITH RECURSIVE`): a generated month ladder
    * left-joined to per-month order counts — calendar gap-fill by recursion. */
  private def cteRecursive(spark: SparkSession, sfDir: String): DataFrame = {
    withViews(spark, sfDir)
    spark.sql(
      """WITH RECURSIVE m(mon) AS (
        |  SELECT 1 UNION ALL SELECT mon + 1 FROM m WHERE mon < 12
        |),
        |oc AS (SELECT month(o_orderdate) AS mon, count(*) AS n
        |       FROM g_orders WHERE year(o_orderdate) = 1997 GROUP BY 1)
        |SELECT m.mon, CAST(coalesce(oc.n, 0) AS BIGINT) AS n
        |FROM m LEFT JOIN oc ON m.mon = oc.mon
        |ORDER BY m.mon""".stripMargin)
  }

  override def queries: Map[String, QueryFn] = Map(
    "sub_in"          -> subIn,
    "sub_not_in"      -> subNotIn,
    "sub_exists"      -> subExists,
    "sub_scalar"      -> subScalar,
    "sub_scalar_corr" -> subScalarCorr,
    "join_lateral"    -> joinLateral,
    "cte_recursive"   -> cteRecursive
  )

  override def oracles: Map[String, String] = Map(
    "sub_not_in" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT nullif(o_custkey, -1) FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "sub_in" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "sub_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'F' AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "sub_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "sub_scalar_corr" ->
      """SELECT l_partkey, count(*) AS n_small
        |FROM lineitem l1
        |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        |GROUP BY l_partkey
        |ORDER BY l_partkey""".stripMargin,
    "join_lateral" ->
      """SELECT o_orderkey, l.n_items, l.max_qty
        |FROM orders,
        |LATERAL (SELECT count(*) AS n_items, max(l_quantity) AS max_qty
        |         FROM lineitem WHERE l_orderkey = o_orderkey) l
        |WHERE o_totalprice > 450000
        |ORDER BY o_orderkey""".stripMargin,
    "cte_recursive" ->
      """WITH RECURSIVE m(mon) AS (
        |  SELECT 1 UNION ALL SELECT mon + 1 FROM m WHERE mon < 12
        |),
        |oc AS (SELECT month(o_orderdate) AS mon, count(*) AS n
        |       FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1)
        |SELECT m.mon, CAST(coalesce(oc.n, 0) AS BIGINT) AS n
        |FROM m LEFT JOIN oc ON m.mon = oc.mon
        |ORDER BY m.mon""".stripMargin
  )
}
