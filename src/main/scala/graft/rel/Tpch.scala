package graft.rel

import graft.{QueryModule, Tables}
import graft.functions.PortableRound.pround
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-style composite headline queries (Q1/Q3/Q5 shapes, adapted to the
  * driver fixture schema — `FIXTURES.md`). The reference's analytics surface
  * is single-table grouped counts (`dag/wiki_pipeline_dag.py:29-39`,
  * `README.md:101-106`); these composites exercise the same aggregation
  * machinery under realistic multi-join plans, which is what a user scaling
  * the reference's lakehouse to a warehouse workload runs next.
  *
  * Scale notes (100 TB):
  *  - Q1 is a pure scan→partial-agg→final-agg pipeline: the shuffle carries
  *    one row per (partition, flag, status) — constant, independent of fact
  *    size. The date filter pushes into the parquet scan.
  *  - Q3/Q5 broadcast every dimension (customer/supplier/nation/region) so
  *    the only shuffle on the fact path is the orders⋈lineitem equi-join;
  *    AQE re-plans it (shuffled-hash vs sort-merge, skew split) at runtime.
  *  - Q3's top-10 is TakeOrderedAndProject — per-partition heaps, no global
  *    sort of the aggregate output.
  */
object Tpch extends QueryModule {

  /** Q1 shape — pricing summary report: one-pass multi-aggregate with a
    * pushed-down date predicate. */
  private def q1(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" <= lit("1999-12-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        pround(sum($"l_quantity"), 2).as("sum_qty"),
        pround(sum($"l_extendedprice"), 2).as("sum_base_price"),
        pround(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        pround(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 2)
          .as("sum_charge"),
        pround(avg($"l_quantity"), 4).as("avg_qty"),
        pround(avg($"l_extendedprice"), 4).as("avg_price"),
        pround(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Q3 shape — shipping-priority top-10: segment-filtered 3-way join,
    * grouped revenue, TakeOrderedAndProject top-K. */
  private def q3(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cutoff = lit("1998-06-30").cast("timestamp")
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" > cutoff)
      .join(Tables.orders(spark, sfDir).filter($"o_orderdate" < cutoff),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, sfDir)
          .filter($"c_mktsegment" === "BUILDING")),
        $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(pround(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  /** Q5 shape — local-supplier volume: 6-way star join with the
    * customer-nation = supplier-nation co-location predicate. */
  private def q5(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                  $"o_orderdate" <  lit("1998-01-01").cast("timestamp")),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, sfDir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.supplier(spark, sfDir)),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(Tables.nation(spark, sfDir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, sfDir)
          .filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(pround(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** Q6 shape — forecasting revenue change: every predicate (ship-year,
    * discount band, quantity cap) pushes into the parquet scan; the
    * aggregate is a single global sum whose shuffle carries ONE row per map
    * partition. The cheapest possible 100 TB query — scan-bound by design. */
  private def q6(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
              $"l_discount".between(0.02, 0.06) &&
              $"l_quantity" < 24)
      .agg(pround(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"))
  }

  /** Q10 shape — returned-item reporting: top-20 customers by lost revenue
    * in a quarter. Unlike Q3/Q5 the customer side is joined with a SHUFFLE
    * equi-join — at warehouse scale `customer` (1.5M rows × SF) outgrows the
    * broadcast threshold, and orders⋈customer co-shuffle on custkey is the
    * plan that survives the scale-up. `nation` stays broadcast. Top-20 is
    * TakeOrderedAndProject (per-partition heaps). */
  private def q10(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_returnflag" === "R")
      .join(Tables.orders(spark, sfDir)
          .filter($"o_orderdate" >= lit("1996-10-01").cast("timestamp") &&
                  $"o_orderdate" <  lit("1997-01-01").cast("timestamp")),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, sfDir)),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(pround(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  override def queries: Map[String, QueryFn] = Map(
    "tpch_q1" -> q1,
    "tpch_q3" -> q3,
    "tpch_q5" -> q5,
    "tpch_q6" -> q6,
    "tpch_q10" -> q10
  )

  override def oracles: Map[String, String] = Map(
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
        |  floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_base_price,
        |  floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS sum_disc_price,
        |  floor(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) / 100 AS sum_charge,
        |  floor(avg(l_quantity) * 10000 + 0.5) / 10000 AS avg_qty,
        |  floor(avg(l_extendedprice) * 10000 + 0.5) / 10000 AS avg_price,
        |  floor(avg(l_discount) * 10000 + 0.5) / 10000 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch_q3" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1998-06-30 00:00:00'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "tpch_q5" ->
      """SELECT n_name,
        |  floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "tpch_q6" ->
      """SELECT floor(sum(l_extendedprice * l_discount) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.06
        |  AND l_quantity < 24""".stripMargin,
    "tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin
  )
}
