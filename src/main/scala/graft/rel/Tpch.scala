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
      // money sums as EXACT BIGINTs in cent / 1e-4 / 1e-6-dollar units
      // (see aggMulti / q9: double accumulation noise crossed the 0.01
      // quantum at the 100× replica volume) — order-independent integers
      .agg(
        pround(sum($"l_quantity"), 2).as("sum_qty"),
        (sum(round($"l_extendedprice" * 100).cast("long")) / lit(100.0))
          .as("sum_base_price"),
        (floor(sum(round($"l_extendedprice" * 100).cast("long") *
            (lit(100L) - round($"l_discount" * 100).cast("long"))) / lit(100.0)
          + lit(0.5)) / lit(100.0)).as("sum_disc_price"),
        (floor(sum(round($"l_extendedprice" * 100).cast("long") *
            (lit(100L) - round($"l_discount" * 100).cast("long")) *
            (lit(100L) + round($"l_tax" * 100).cast("long"))) / lit(10000.0)
          + lit(0.5)) / lit(100.0)).as("sum_charge"),
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

  /** Q4 shape — order-priority checking: EXISTS-correlated count of orders
    * with at least one late-shipped line (l_shipdate > o_orderdate + 60d).
    * Catalyst plans the EXISTS as a left-semi join on o_orderkey — at scale
    * the semi join shuffles once on the order key and the grouped count is
    * a constant-width aggregate. */
  private def q4(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val late = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_shipdate")
    Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1996-07-01").cast("timestamp"))
      .join(late,
        $"o_orderkey" === $"l_orderkey" &&
          $"l_shipdate" > date_add($"o_orderdate", 60).cast("timestamp"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** Q12 shape — shipping-mode priority split: conditional CASE sums in one
    * pass over the join (no l_shipmode in the fixture; split on returnflag).
    * The two sums are map-side partial aggregates — one shuffle row per
    * group regardless of fact size. */
  private def q12(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val highPrio = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(
        sum(when(highPrio, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!highPrio, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy($"l_returnflag")
  }

  /** Q14 shape — promotion effect: ratio of conditional revenue to total
    * revenue over a month, via a broadcast part join. A single global
    * aggregate row — the 100 TB cost is the scan, not the agg. */
  private def q14(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-03-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1996-04-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, sfDir)), $"l_partkey" === $"p_partkey")
      .agg(
        pround(
          lit(100.0) *
            sum(when($"p_type" === "PROMO",
              $"l_extendedprice" * (lit(1) - $"l_discount")).otherwise(0.0)) /
            sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4)
          .as("promo_revenue_pct"))
  }

  /** Q16 shape — supplier-part relationship counting: distinct suppliers
    * per (brand, type, size) bucket with a NOT-IN supplier exclusion
    * (lineitem stands in for partsupp). count(DISTINCT) over the join
    * output expands to a two-phase aggregate; the excluded-supplier
    * subquery becomes a broadcast anti join. */
  private def q16(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val excluded = Tables.supplier(spark, sfDir)
      .filter($"s_name".like("%#000000003%"))
      .select($"s_suppkey".as("x_suppkey"))
    Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_suppkey").distinct()
      .join(broadcast(excluded), $"l_suppkey" === $"x_suppkey", "left_anti")
      .join(Tables.part(spark, sfDir).filter($"p_size".isin(1, 5, 9, 13, 17)),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  /** Q18 shape — large-volume customers: IN-subquery over a HAVING
    * aggregate. The inner groupBy(l_orderkey) is the big shuffle; its
    * survivor set is small, so Catalyst's semi join onto orders is cheap.
    * At 100 TB the HAVING filter is the cardinality cliff that makes this
    * pattern viable — without it the join side would be the full fact. */
  private def q18(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bigOrders = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 90.0)
      .select($"l_orderkey".as("big_okey"), $"sum_qty")
    Tables.orders(spark, sfDir)
      .join(bigOrders, $"o_orderkey" === $"big_okey")
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", pround($"sum_qty", 2).as("total_qty"))
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  /** Q19 shape — discounted revenue under disjunctive bracket predicates:
    * three OR-ed (brand × size × quantity) brackets over the part join.
    * Catalyst cannot push an OR across tables, but it DOES extract the
    * common l_quantity bounds and prunes part columns; the join stays
    * broadcast so the disjunction is evaluated map-side. */
  private def q19(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bracket1 = $"p_brand" === "Brand#1" && $"p_size".between(1, 10) &&
      $"l_quantity".between(1, 20)
    val bracket2 = $"p_brand" === "Brand#2" && $"p_size".between(5, 20) &&
      $"l_quantity".between(10, 35)
    val bracket3 = $"p_brand" === "Brand#3" && $"p_size".between(10, 40) &&
      $"l_quantity".between(20, 50)
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)), $"l_partkey" === $"p_partkey")
      .filter(bracket1 || bracket2 || bracket3)
      // exact 1e-4-dollar-unit sum (see q1/q9: double accumulation noise
      // crossed the 0.01 quantum at the 100× volume)
      .agg((floor(sum(round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long"))) / lit(100.0)
        + lit(0.5)) / lit(100.0)).as("revenue"))
  }

  /** Q22 shape — global-customer sanity: customers above the positive-mean
    * account balance with no orders at all. The scalar AVG subquery
    * broadcasts one value; the NOT EXISTS is a shuffle anti join on
    * custkey. Substring bucketing stands in for the phone country code. */
  private def q22(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
    // scalar AVG as a broadcast cross join: stays lazy/declarative, one
    // value ships to every task — the plan Catalyst builds for a scalar
    // subquery, written explicitly.
    val meanBal = cust.filter($"c_acctbal" > 0.0)
      .agg(avg($"c_acctbal").as("mean_bal"))
    cust
      .crossJoin(broadcast(meanBal))
      .filter($"c_acctbal" > $"mean_bal")
      .join(Tables.orders(spark, sfDir)
          .filter($"o_totalprice" > 300000.0).select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .withColumn("bucket", expr("right(c_name, 1)"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("numcust"),
        pround(sum($"c_acctbal"), 2).as("totacctbal"))
      .orderBy($"bucket")
  }

  /** Q2 shape — minimum-cost supplier per part (partsupp is not in the
    * fixture, so lineitem's (partkey, suppkey) pairs stand in as the supply
    * relation and s_acctbal as the cost): per STANDARD part supplied from
    * EUROPE, the supplier with the lowest account balance. The correlated
    * per-part MIN is a `min_by` AGGREGATE (partial+final, no per-part
    * sort), not a window — the same argmin discipline as `sim_ann_ivf`. */
  private def q2(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val euroSupp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, sfDir).filter($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_suppkey").distinct()
      .join(broadcast(euroSupp), $"l_suppkey" === $"s_suppkey")
      .join(Tables.part(spark, sfDir).filter($"p_type" === "STANDARD"),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_partkey", $"p_name")
      .agg(min_by(struct($"s_acctbal", $"s_name", $"n_name"),
        struct($"s_acctbal", $"s_suppkey")).as("m"))
      .select($"m.s_acctbal".as("s_acctbal"), $"m.s_name".as("s_name"),
        $"m.n_name".as("n_name"), $"p_partkey", $"p_name")
      .orderBy($"s_acctbal".desc, $"p_partkey")
      .limit(100)
  }

  /** Q7 shape — volume shipping between two trade areas (region-level:
    * nation-level pairs are empty at the smallest fixture), both
    * directions, by ship year. The nation→region lookup broadcasts; the
    * fact path shuffles once on the order key. */
  private def q7(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nr = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"r_name")
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(nr), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"r_name".as("supp_region"))
    val cust = Tables.customer(spark, sfDir)
      .join(broadcast(nr), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"r_name".as("cust_region"))
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .filter(($"supp_region" === "EUROPE" && $"cust_region" === "ASIA") ||
              ($"supp_region" === "ASIA" && $"cust_region" === "EUROPE"))
      .groupBy($"supp_region", $"cust_region",
        year($"l_shipdate").cast("long").as("l_year"))
      .agg(pround(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"supp_region", $"cust_region", $"l_year")
  }

  /** Q8 shape — market share of one supplying nation inside a consuming
    * region, per order year: conditional revenue ratio over a 6-way join.
    * All dimension sides broadcast; the only fact shuffle is
    * orders⋈lineitem. */
  private def q8(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val asiaCust = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, sfDir).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey")
    val suppNat = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val vol = $"l_extendedprice" * (lit(1) - $"l_discount")
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir).filter($"p_type" === "ECONOMY")
        .select($"p_partkey")), $"l_partkey" === $"p_partkey")
      .join(Tables.orders(spark, sfDir)
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                  $"o_orderdate" <  lit("1998-01-01").cast("timestamp")),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(asiaCust), $"o_custkey" === $"c_custkey")
      .join(broadcast(suppNat), $"l_suppkey" === $"s_suppkey")
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg(pround(
        sum(when($"supp_nation" === "NATION_5", vol).otherwise(0.0)) / sum(vol), 6)
        .as("mkt_share"))
      .orderBy($"o_year")
  }

  /** Q9 shape — product-type profit by supplying nation and year. The
    * fixture has no partsupp.ps_supplycost, so unit cost is proxied as
    * 0.6·p_retailprice (fixed margin) — the dataflow (5-way join, grouped
    * signed sum) is the Q9 plan exactly. */
  private def q9(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)
          .filter($"p_name".like("%widget%"))
          .select($"p_partkey", $"p_retailprice")),
        $"l_partkey" === $"p_partkey")
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.supplier(spark, sfDir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, sfDir)), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"), year($"o_orderdate").cast("long").as("o_year"))
      // profit sums as an EXACT BIGINT in 1e-4-dollar units (prices/
      // discounts are 2-decimal by construction, quantity integral), so
      // the group total is order-independent — a double sum's accumulation
      // noise crossed the 0.01 rounding quantum at the 10× replica volume
      .agg(sum(
        round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long")) -
        lit(60L) * round($"p_retailprice" * 100).cast("long") *
          round($"l_quantity").cast("long")).as("px4"))
      .select($"nation", $"o_year",
        (floor($"px4" / lit(100.0) + lit(0.5)) / lit(100.0)).as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  /** Q11 shape — important-part value concentration (partsupp-free: value
    * per part = revenue shipped by NATION_3's suppliers), keeping parts
    * above a fraction of the total. The global total is ONE scalar row
    * broadcast to the filter — the HAVING-over-scalar-subquery plan. */
  private def q11(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val natSupp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir).filter($"n_name" === "NATION_3")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val vals = Tables.lineitem(spark, sfDir)
      .join(broadcast(natSupp), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey")
      .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("raw_value"))
    val total = vals.agg(sum($"raw_value").as("total_value"))
    vals.crossJoin(broadcast(total))
      .filter($"raw_value" > lit(0.001) * $"total_value")
      .select($"l_partkey", pround($"raw_value", 2).as("value"))
      .orderBy($"value".desc, $"l_partkey")
  }

  /** Q13 shape — customer order-count distribution: LEFT OUTER join so
    * zero-order customers survive into the c_count=0 bucket, then a
    * second aggregation over the first's output (a ≤|customer| relation —
    * the double-agg is cheap at any scale). Priority filter stands in for
    * the comment NOT LIKE (no o_comment in the fixture). */
  private def q13(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter($"o_orderpriority" =!= "1-URGENT"),
        $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** Q15 shape — top supplier by quarterly revenue: the revenue "view" is
    * a grouped aggregate, its MAX is a broadcast scalar, and the equality
    * re-join selects the top supplier(s). Equality compares ROUNDED
    * revenues (both engines round identically, so ties select identically
    * — raw double equality across engines would be fragile). */
  private def q15(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(pround(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2)
        .as("total_revenue"))
    val maxRev = rev.agg(max($"total_revenue").as("max_rev"))
    rev.crossJoin(broadcast(maxRev))
      .filter($"total_revenue" === $"max_rev")
      .join(broadcast(Tables.supplier(spark, sfDir)), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  /** Q17 shape — small-quantity-order revenue: lines under half their
    * part's average quantity, for one brand. The correlated AVG is
    * decorrelated into a grouped aggregate joined back on the part key —
    * the plan Catalyst produces for the classic correlated form, written
    * explicitly. */
  private def q17(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val partAvg = Tables.lineitem(spark, sfDir)
      .groupBy($"l_partkey")
      .agg(avg($"l_quantity").as("avg_qty"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)
        .filter($"p_brand" === "Brand#1").select($"p_partkey")),
        $"l_partkey" === $"p_partkey")
      .join(partAvg, Seq("l_partkey"))
      .filter($"l_quantity" < lit(0.5) * $"avg_qty")
      .agg(pround(sum($"l_extendedprice") / 7.0, 2).as("avg_yearly"))
  }

  /** Q20 shape — suppliers with heavy shipments of a part class in a year:
    * part filter → fact aggregate with HAVING → LEFT SEMI back to the
    * supplier dimension. The semi join carries only qualifying suppkeys. */
  private def q20(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val heavy = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1998-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, sfDir)
        .filter($"p_name".like("%red%")).select($"p_partkey")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey")
      .agg(sum($"l_quantity").as("qty"))
      .filter($"qty" > 100.0)
      .select($"l_suppkey")
    Tables.supplier(spark, sfDir)
      .join(heavy, $"s_suppkey" === $"l_suppkey", "left_semi")
      .join(broadcast(Tables.nation(spark, sfDir)), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"n_name")
      .orderBy($"s_suppkey")
  }

  /** Q21 shape — suppliers who kept orders waiting: finished orders with
    * ≥2 distinct suppliers where EXACTLY ONE supplier shipped late
    * (l_shipdate > o_orderdate + 60d stands in for receipt>commit). The
    * classic EXISTS / NOT EXISTS pair is expressed as per-order
    * distinct-counts — one aggregate over the joined fact instead of two
    * correlated self-joins, the shape that scales (each correlated EXISTS
    * would re-shuffle lineitem; this shuffles it once). */
  private def q21(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Reduce to one row per (order, supplier) FIRST and share that frame:
    // the previous form ran two exact count(DISTINCT)s over the joined
    // fact (Catalyst plans an Expand — every row duplicated once per
    // distinct aggregate, 2× the shuffle) plus a separate distinct() for
    // the late-supplier projection (a third shuffle of the fact). Here
    // max(late) per (order, supplier) is ONE partial-aggregated pass;
    // n_supp = count of pairs, n_late = count of late pairs (no distincts
    // left, so no Expand), and the late projection is a filter of the
    // same cached frame. Partition by o_orderkey before the pair agg so
    // the pair frame, the per-order rollup AND the final join all reuse
    // one exchange (guide §2.4: two operations keyed the same way share
    // one exchange; orders have ≤7 lines, so no skew).
    val perSupp = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter($"o_orderstatus" === "F"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_orderkey", $"l_suppkey",
        ($"l_shipdate" > date_add($"o_orderdate", 60).cast("timestamp")).as("late"))
      .repartition($"o_orderkey")
      .groupBy($"o_orderkey", $"l_suppkey")
      .agg(max($"late").as("late"))
      .transform(Materialize.once)
    val waiting = perSupp.groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        count(when($"late", 1)).as("n_late"))
      .filter($"n_supp" >= 2 && $"n_late" === 1)
      .select($"o_orderkey")
    perSupp.filter($"late").select($"o_orderkey", $"l_suppkey")
      .join(waiting, Seq("o_orderkey"))
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, sfDir)), $"l_suppkey" === $"s_suppkey")
      .select($"s_name", $"numwait")
      .orderBy($"numwait".desc, $"s_name")
      .limit(20)
  }

  override def queries: Map[String, QueryFn] = Map(
    "tpch_q1" -> q1,
    "tpch_q3" -> q3,
    "tpch_q2" -> q2,
    "tpch_q4" -> q4,
    "tpch_q5" -> q5,
    "tpch_q6" -> q6,
    "tpch_q7" -> q7,
    "tpch_q8" -> q8,
    "tpch_q9" -> q9,
    "tpch_q10" -> q10,
    "tpch_q11" -> q11,
    "tpch_q12" -> q12,
    "tpch_q13" -> q13,
    "tpch_q14" -> q14,
    "tpch_q15" -> q15,
    "tpch_q16" -> q16,
    "tpch_q17" -> q17,
    "tpch_q18" -> q18,
    "tpch_q19" -> q19,
    "tpch_q20" -> q20,
    "tpch_q21" -> q21,
    "tpch_q22" -> q22
  )

  override def oracles: Map[String, String] = Map(
    "tpch_q2" ->
      """WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |es AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |ranked AS (
        |  SELECT p_partkey, p_name, s_acctbal, s_name, n_name,
        |         row_number() OVER (PARTITION BY p_partkey
        |                            ORDER BY s_acctbal, s_suppkey) AS rn
        |  FROM supply
        |  JOIN es ON l_suppkey = s_suppkey
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM ranked WHERE rn = 1
        |ORDER BY s_acctbal DESC, p_partkey LIMIT 100""".stripMargin,
    "tpch_q7" ->
      """WITH nr AS (
        |  SELECT n_nationkey, r_name FROM nation
        |  JOIN region ON n_regionkey = r_regionkey)
        |SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
        |       year(l_shipdate) AS l_year,
        |       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nr sr ON s_nationkey = sr.n_nationkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nr cr ON c_nationkey = cr.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((sr.r_name = 'EUROPE' AND cr.r_name = 'ASIA') OR
        |       (sr.r_name = 'ASIA' AND cr.r_name = 'EUROPE'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_region, cust_region, l_year""".stripMargin,
    "tpch_q8" ->
      """SELECT year(o_orderdate) AS o_year,
        |  floor(sum(CASE WHEN n2.n_name = 'NATION_5'
        |                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
        |        sum(l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) / 1000000 AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1
        |ORDER BY o_year""".stripMargin,
    "tpch_q9" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  floor(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |              (100 - CAST(round(l_discount * 100) AS BIGINT)) -
        |            60 * CAST(round(p_retailprice * 100) AS BIGINT) *
        |              CAST(round(l_quantity) AS BIGINT)) / 100.0 + 0.5) / 100.0 AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,
    "tpch_q11" ->
      """WITH vals AS (
        |  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS raw_value
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |  GROUP BY 1)
        |SELECT l_partkey, floor(raw_value * 100 + 0.5) / 100 AS value
        |FROM vals
        |WHERE raw_value > 0.001 * (SELECT sum(raw_value) FROM vals)
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
        |           AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "tpch_q17" ->
      """WITH pa AS (
        |  SELECT l_partkey, avg(l_quantity) AS avg_qty FROM lineitem GROUP BY 1)
        |SELECT floor(sum(l_extendedprice) / 7.0 * 100 + 0.5) / 100 AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'
        |JOIN pa USING (l_partkey)
        |WHERE l_quantity < 0.5 * avg_qty""".stripMargin,
    "tpch_q20" ->
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_suppkey
        |  HAVING sum(l_quantity) > 100.0)
        |ORDER BY s_suppkey""".stripMargin,
    "tpch_q21" ->
      """WITH lo AS (
        |  SELECT o_orderkey, l_suppkey,
        |         l_shipdate > CAST(CAST(o_orderdate AS DATE) + INTERVAL 60 DAY AS TIMESTAMP) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |waiting AS (
        |  SELECT o_orderkey FROM lo GROUP BY 1
        |  HAVING count(DISTINCT l_suppkey) >= 2
        |     AND count(DISTINCT CASE WHEN late THEN l_suppkey END) = 1)
        |SELECT s_name, count(*) AS numwait
        |FROM (SELECT DISTINCT o_orderkey, l_suppkey FROM lo WHERE late) ls
        |JOIN waiting USING (o_orderkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
        |  floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |                  (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |        / 100.0 + 0.5) / 100.0 AS sum_disc_price,
        |  floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |                  (100 - CAST(round(l_discount * 100) AS BIGINT)) *
        |                  (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT)
        |        / 10000.0 + 0.5) / 100.0 AS sum_charge,
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
    "tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > CAST(CAST(o_orderdate AS DATE) + INTERVAL 60 DAY AS TIMESTAMP))
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "tpch_q14" ->
      """SELECT floor(100.0 *
        |    sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) /
        |    sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5) / 10000 AS promo_revenue_pct
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,
    "tpch_q16" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_size IN (1, 5, 9, 13, 17)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%#000000003%')
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  floor(sum_qty * 100 + 0.5) / 100 AS total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey AS big_okey, sum(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 90.0) big
        |  ON o_orderkey = big_okey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "tpch_q19" ->
      """SELECT floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |                       (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |             / 100.0 + 0.5) / 100.0 AS revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 35)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 50)""".stripMargin,
    "tpch_q22" ->
      """SELECT right(c_name, 1) AS bucket, count(*) AS numcust,
        |  floor(sum(c_acctbal) * 100 + 0.5) / 100 AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |GROUP BY right(c_name, 1)
        |ORDER BY bucket""".stripMargin,
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
