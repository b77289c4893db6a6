package graft.rel

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.pround

/** Join surface (SURVEY.md §2.3). The reference itself contains zero joins —
  * this is the star-schema extension mandated by the north star, exercised on
  * the TPC-H-ish fixtures.
  *
  * Scale notes (100 TB):
  *  - Small dimensions (`region`, `nation`, `supplier`, `part`, `customer`)
  *    are explicitly `broadcast()` so the fact table never shuffles for them;
  *    at 100 TB the fact scan streams through map-side hash joins.
  *  - Fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE picks
  *    shuffled-hash vs sort-merge and splits skewed partitions at runtime.
  *  - The as-of join is implemented as union + window (one shuffle on the
  *    partition key, linear scan) rather than a range join (quadratic per
  *    key) — this is THE scalable as-of formulation, same as what dedicated
  *    time-series engines compile to.
  */
object Joins extends QueryModule {

  /** J1 — inner equi-join; planner picks shuffle strategy for fact-fact. */
  private def joinInner(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_custkey", $"c_name", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** J2 — broadcast join: the dimension ships to every task, no fact shuffle. */
  private def joinBroadcast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"l_linenumber", $"p_brand", $"p_type")
      // (l_orderkey, l_linenumber) is NOT unique in the fixture (the
      // generator reuses line numbers) — order by every output column so
      // the total order the cross-engine compare needs actually exists;
      // rows equal on all four are interchangeable, so this IS total
      .orderBy($"l_orderkey", $"l_linenumber", $"p_brand", $"p_type")
  }

  /** J3 — multi-way star join (6 tables): revenue by region. */
  private def joinStar(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, sfDir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.supplier(spark, sfDir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, sfDir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, sfDir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      // exact 1e-4-dollar-unit sum (order-independent BIGINT — the double
      // form crossed the 0.01 quantum at 100×; see Aggs.aggMulti)
      .agg(
        count(lit(1)).as("n_items"),
        (floor(sum(round($"l_extendedprice" * 100).cast("long") *
            (lit(100L) - round($"l_discount" * 100).cast("long"))) / lit(100.0)
          + lit(0.5)) / lit(100.0)).as("revenue"))
      .orderBy($"r_name")
  }

  /** J4a — left outer join: order counts per customer including zeros. */
  private def joinLeft(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir), $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"))
      .orderBy($"c_custkey")
  }

  /** J4b — full outer join of two per-day aggregates; `coalesce` of the two
    * keys yields a never-null sort key (null-ordering-proof). */
  private def joinFull(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d1 = Tables.orders(spark, sfDir)
      .groupBy(to_date($"o_orderdate").as("d1")).agg(count(lit(1)).as("n_orders"))
    val d2 = Tables.lineitem(spark, sfDir)
      .groupBy(to_date($"l_shipdate").as("d2")).agg(count(lit(1)).as("n_items"))
    d1.join(d2, $"d1" === $"d2", "full_outer")
      .select(coalesce($"d1", $"d2").as("d"), $"n_orders", $"n_items")
      .orderBy($"d")
  }

  /** J5a — left semi join (EXISTS). */
  private def joinSemi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir), $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** J5b — left anti join (NOT EXISTS): customers with no URGENT order. */
  private def joinAnti(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val urgent = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
    Tables.customer(spark, sfDir)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** J6 — range (non-equi) join: events following a signup within one hour,
    * blocked on the COMPOSITE (user_id, hour-bucket) key.
    *
    * User-only blocking ("theta runs within a key group") is correct but
    * quadratic IN THE KEY GROUP: the round-11 100×-Zipf campaign caught
    * the hot user's group degenerating to |signups|·|events| ≈ 3×10¹¹
    * per-pair predicate evaluations on one task — invisible at uniform
    * corpora, fatal under skew. Adding the [[joinRangeBinned]] time
    * bucket to the equi key bounds every group by one user-HOUR: each
    * signup interval (a_ts, a_ts+1h] covers exactly two hour buckets
    * (exploded copies), each event belongs to exactly one, so every
    * qualifying pair meets exactly once (no dedup) and the exact theta
    * filters inside micro-groups. Hot keys now split like any equi key
    * (AQE skew-split applies); semantics and oracle unchanged. */
  private def joinRange(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val BinSeconds = 3600L
    val a = e.filter($"event_type" === "signup")
      .select($"event_id".as("a_id"), $"user_id".as("a_user"), $"ts".as("a_ts"))
      .withColumn("a_bucket", explode(sequence(
        floor(unix_timestamp($"a_ts") / BinSeconds),
        floor((unix_timestamp($"a_ts") + BinSeconds) / BinSeconds))))
    val b = e.select($"user_id".as("b_user"), $"ts".as("b_ts"),
      floor(unix_timestamp($"ts") / BinSeconds).as("b_bucket"))
    a.join(b,
        $"a_user" === $"b_user" && $"a_bucket" === $"b_bucket" &&
        $"b_ts" > $"a_ts" &&
        $"b_ts" <= $"a_ts" + expr("INTERVAL 1 HOUR"))
      .groupBy($"a_id")
      .agg(count(lit(1)).as("n_follow"))
      .orderBy($"a_id")
  }

  /** J7 — as-of join: for each purchase, the latest signup of the same user
    * at-or-before it. Union + ordered window (scalable formulation): one
    * shuffle on user_id, then a linear `last(signup_ts)` carry-forward.
    * Signup sorts before purchase at equal ts so "at-or-before" is inclusive.
    */
  private def joinAsof(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .filter($"event_type".isin("signup", "purchase"))
      .select($"event_id", $"user_id", $"ts", $"event_type",
        when($"event_type" === "signup", $"ts").as("signup_ts"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, when($"event_type" === "signup", 0).otherwise(1).asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_signup_ts", last($"signup_ts", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase" && $"last_signup_ts".isNotNull)
      .select($"event_id", $"user_id", $"last_signup_ts")
      .orderBy($"event_id")
  }

  /** J7d — as-of with TOLERANCE (pandas `merge_asof(tolerance=...)`): the
    * backward match only counts if it lies within a bounded lookback (72 h
    * here) — the semantics every feature-store point-in-time join needs so
    * a years-stale dimension row never leaks into a feature. Identical
    * one-shuffle union+ordered-window shape as [[joinAsof]]; the tolerance
    * is a pure row-local filter AFTER the window, so the plan cost is
    * unchanged — no range join appears. */
  private def joinAsofTolerance(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .filter($"event_type".isin("signup", "purchase"))
      .select($"event_id", $"user_id", $"ts", $"event_type",
        when($"event_type" === "signup", $"ts").as("signup_ts"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, when($"event_type" === "signup", 0).otherwise(1).asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_signup_ts", last($"signup_ts", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase" && $"last_signup_ts".isNotNull &&
        $"last_signup_ts" >= $"ts" - expr("INTERVAL 72 HOURS"))
      .select($"event_id", $"user_id", $"last_signup_ts")
      .orderBy($"event_id")
  }

  /** J7b — FORWARD as-of: for each purchase, the first signup at-or-after
    * it. Same union+ordered-window shape as [[joinAsof]] (one shuffle on
    * the key, linear scan); at equal timestamps the signup still counts
    * ("at-or-after" inclusive).
    *
    * Frame shape matters at scale: the naive form is `first(...)` over
    * `[currentRow, unboundedFollowing]` in ASC order, but Spark evaluates
    * an UnboundedFollowing frame by RE-AGGREGATING from each row to the
    * partition end — O(n²) per partition. Uniform corpora hide it
    * (n ≈ rows/user is tiny); the round-11 100×-Zipf campaign caught it
    * live: the hot user's partition made one task quadratic (~10¹¹ row
    * ops, effectively hung). The equivalent O(n) running form used here
    * REVERSES every sort key and takes `last(...)` over
    * `[unboundedPreceding, currentRow]` — the same row set, the same
    * nearest-at-or-after non-null (scanning farthest-future → current,
    * `last` picks the one closest to current), evaluated as a single
    * running aggregate. Verified hash-identical to the old form at
    * sf0.01/sf0.1 and completes in seconds at the Zipf corpus. */
  private def joinAsofForward(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .filter($"event_type".isin("signup", "purchase"))
      .select($"event_id", $"user_id", $"ts", $"event_type",
        when($"event_type" === "signup", $"ts").as("signup_ts"))
    val wNext = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, when($"event_type" === "signup", 1).otherwise(0).desc, $"event_id".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("next_signup_ts", last($"signup_ts", ignoreNulls = true).over(wNext))
      .filter($"event_type" === "purchase" && $"next_signup_ts".isNotNull)
      .select($"event_id", $"user_id", $"next_signup_ts")
      .orderBy($"event_id")
  }

  /** J7c — NEAREST as-of: the signup closest in time, either direction,
    * ties to the earlier (backward) side — pandas `merge_asof
    * direction='nearest'` semantics. Both directional candidates come
    * from the two ordered windows above: ONE shuffle on the key, two
    * linear sorted passes, then a pure row-local comparison — never a
    * range join or pair expansion. */
  private def joinAsofNearest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .filter($"event_type".isin("signup", "purchase"))
      .select($"event_id", $"user_id", $"ts", $"event_type",
        when($"event_type" === "signup", $"ts").as("signup_ts"))
    val wPrev = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, when($"event_type" === "signup", 0).otherwise(1).asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // reversed running form, NOT [currentRow, unboundedFollowing] — that
    // frame is O(n²) per partition (see [[joinAsofForward]]'s scaladoc;
    // caught by the 100×-Zipf campaign)
    val wNext = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, when($"event_type" === "signup", 1).otherwise(0).desc, $"event_id".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("prev_ts", last($"signup_ts", ignoreNulls = true).over(wPrev))
      .withColumn("next_ts", last($"signup_ts", ignoreNulls = true).over(wNext))
      .filter($"event_type" === "purchase" &&
        ($"prev_ts".isNotNull || $"next_ts".isNotNull))
      .withColumn("nearest_signup_ts",
        when($"prev_ts".isNull, $"next_ts")
          .when($"next_ts".isNull, $"prev_ts")
          .when(unix_micros($"ts".cast("timestamp")) - unix_micros($"prev_ts".cast("timestamp")) <=
                unix_micros($"next_ts".cast("timestamp")) - unix_micros($"ts".cast("timestamp")), $"prev_ts")
          .otherwise($"next_ts"))
      .select($"event_id", $"user_id", $"nearest_signup_ts")
      .orderBy($"event_id")
  }

  /** J7e — the NATIVE as-of join: identical semantics and oracle as
    * [[joinAsof]], executed by the custom whole-operator
    * [[graft.plans.AsOfJoinExec]] (logical node + strategy + physical
    * sort-merge exec — extension tier (c)) instead of the union +
    * ordered-window rewrite. Each side shuffles once on `user_id` and
    * sort-merges per partition with O(1) state; see the operator scaladoc
    * for why this beats the window form at scale. */
  private def joinAsofNative(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val signups = e.filter($"event_type" === "signup")
      .select($"user_id".as("s_user"), $"ts".as("s_ts"))
    graft.plans.AsOf.join(purchases, signups,
        leftKeys = Seq("user_id"), rightKeys = Seq("s_user"),
        leftTime = "ts", rightTime = "s_ts")
      .select($"event_id", $"user_id", $"s_ts".as("last_signup_ts"))
      .orderBy($"event_id")
  }

  /** J7e forward/nearest/tolerance under the native exec — the full pandas
    * `merge_asof` direction surface on [[joinAsofNative]]'s operator; each
    * shares its window-formulation twin's oracle. */
  private def joinAsofNativeDir(direction: String, tolMicros: Option[Long],
      outCol: String)(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val signups = e.filter($"event_type" === "signup")
      .select($"user_id".as("s_user"), $"ts".as("s_ts"))
    graft.plans.AsOf.join(purchases, signups,
        leftKeys = Seq("user_id"), rightKeys = Seq("s_user"),
        leftTime = "ts", rightTime = "s_ts",
        direction = direction, tolerance = tolMicros)
      .select($"event_id", $"user_id", $"s_ts".as(outCol))
      .orderBy($"event_id")
  }

  /** Skew-mitigated equi-join (SURVEY §7 risk register): semantically a
    * plain inner join — the oracle is the unsalted SQL — but the hot keys
    * spread over 8 reducers. See [[SkewJoin]]. */
  private def joinSkewSalted(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    SkewJoin.saltedJoin(
        Tables.orders(spark, sfDir), Tables.customer(spark, sfDir),
        "o_custkey", "c_custkey", saltFactor = 8)
      .select($"o_orderkey", $"c_name")
      .orderBy($"o_orderkey")
  }

  /** J8 — cross join (tiny dims only). */
  private def joinCross(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val statuses = Tables.orders(spark, sfDir)
      .select($"o_orderstatus").distinct()
    Tables.region(spark, sfDir)
      .crossJoin(statuses)
      .select($"r_regionkey", $"r_name", $"o_orderstatus")
      .orderBy($"r_regionkey", $"o_orderstatus")
  }

  /** J6b — PURE interval join (no equi key), the bin-then-exact-filter
    * formulation: for each signup, count the events of ANY user in the
    * following hour. Without an equi key Spark would plan this as
    * BroadcastNestedLoopJoin — O(n·m) and an OOM once neither side
    * broadcasts. The 100-TB shape instead MANUFACTURES an equi key:
    *
    *   1. explode each interval into the fixed-width time buckets it
    *      covers (bin width = the interval length, 1 h, so every interval
    *      lands in exactly 2 buckets — duplication factor
    *      ceil(len/width)+1 is the knob: wider bins = fewer copies but
    *      fuller buckets, narrower = the reverse; width ≈ typical interval
    *      length minimizes copies·bucket-occupancy);
    *   2. each point belongs to exactly ONE bucket, so the bucket
    *      equi-join meets every qualifying (interval, point) pair exactly
    *      once — no post-join dedup;
    *   3. the exact range predicate filters inside buckets only.
    *
    * One near-linear shuffle on the bucket key replaces the nested loop;
    * skewed buckets split under AQE like any hot equi key. */
  private def joinRangeBinned(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val BinSeconds = 3600L
    val iv = e.filter($"event_type" === "signup")
      .select($"event_id".as("a_id"), $"ts".as("a_ts"))
      .select($"a_id", $"a_ts", explode(sequence(
        floor(unix_timestamp($"a_ts") / BinSeconds),
        floor((unix_timestamp($"a_ts") + BinSeconds) / BinSeconds))).as("bucket"))
    val pts = e.select($"ts".as("b_ts"),
      floor(unix_timestamp($"ts") / BinSeconds).as("bucket"))
    iv.join(pts, Seq("bucket"))
      .filter($"b_ts" > $"a_ts" &&
        $"b_ts" <= $"a_ts" + expr("INTERVAL 1 HOUR"))
      .groupBy($"a_id")
      .agg(count(lit(1)).as("n_any"))
      .orderBy($"a_id")
  }

  /** J6c — interval-OVERLAP join (interval × interval, no equi key), the
    * second pure-range shape after [[joinRangeBinned]]'s interval × point:
    * which high-quantity shipment windows (shipdate..+7 d) overlap each
    * high-value order's 3-week fulfilment window? Both sides are interval
    * sets, so the "point belongs to exactly one bucket" dedup-free property
    * is gone — BOTH sides explode into the fixed-width buckets they cover
    * and an overlapping pair now shares ceil(overlap/width)+1 buckets.
    * Instead of a post-join `distinct` (a second full shuffle over the
    * pair set), each pair is kept exactly once by a PURE PREDICATE: the
    * bucket containing `greatest(a_lo, b_lo)` is the FIRST bucket both
    * intervals cover (each interval covers a contiguous bucket range, and
    * max of the two starts lies inside both intervals whenever they
    * overlap), so `bucket = bin(greatest(a_lo, b_lo))` selects one
    * canonical meeting bucket per pair — dedup folded into the join
    * filter, zero extra exchanges. Bin width (7 d ≈ the shorter side's
    * interval length) is the same copies-vs-occupancy knob documented on
    * [[joinRangeBinned]]. */
  private def joinIntervalOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val BinDays = 7
    def bin(c: org.apache.spark.sql.Column) =
      floor(datediff(c, to_date(lit("1970-01-01"))) / BinDays)
    val promos = Tables.orders(spark, sfDir)
      .filter($"o_totalprice" > 480000.0)
      .select($"o_orderkey",
        to_date($"o_orderdate").as("p_lo"),
        date_add(to_date($"o_orderdate"), 20).as("p_hi"))
    val ships = Tables.lineitem(spark, sfDir)
      .filter($"l_quantity" >= 49)
      .select(to_date($"l_shipdate").as("s_lo"),
        date_add(to_date($"l_shipdate"), 7).as("s_hi"))
    val pBinned = promos
      .withColumn("bucket", explode(sequence(bin($"p_lo"), bin($"p_hi"))))
    val sBinned = ships
      .withColumn("bucket", explode(sequence(bin($"s_lo"), bin($"s_hi"))))
    pBinned.join(sBinned, Seq("bucket"))
      .filter($"s_lo" <= $"p_hi" && $"p_lo" <= $"s_hi" &&
        $"bucket" === bin(greatest($"p_lo", $"s_lo")))
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_shipments"),
        sum(datediff(least($"p_hi", $"s_hi"), greatest($"p_lo", $"s_lo")) + 1)
          .cast("bigint").as("overlap_days"))
      .orderBy($"o_orderkey")
  }

  /** Confs that arm runtime bloom-filter join pruning for [[joinRuntimeBloom]]:
    * the feature itself plus fixture-scale threshold overrides (the
    * application-side scan must look "big enough to be worth filtering" —
    * 10 GB by default — and the join must be a shuffle join, not broadcast;
    * at 100 TB both hold naturally and only the first conf is needed). */
  private[graft] val RuntimeBloomConfs = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  /** The plan under test, shared by the declared query and PlanSpec's
    * injected-filter gate: a selective fact-fact join — lineitem against
    * the urgent high-value slice of orders. With runtime bloom filtering
    * on, Catalyst builds a bloom filter over the FILTERED orders keys and
    * injects `might_contain(xxhash64(l_orderkey))` below the lineitem
    * shuffle, so ~the whole non-qualifying fact never enters the exchange
    * — the runtime complement to static pushdown (`filter_partition_prune`)
    * and dynamic partition pruning (`filter_dynamic_prune`). */
  private[graft] def runtimeBloomPlan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sel = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 150000.0)
      .select($"o_orderkey")
    Tables.lineitem(spark, sfDir)
      .join(sel, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        pround(sum($"l_extendedprice"), 2).as("rev"))
      .orderBy($"l_returnflag")
  }

  /** J11 — runtime bloom-filter join pruning, declared form. The confs
    * must be active at EXECUTION time, so the result materializes eagerly
    * inside the conf scope ([[graft.rel.Materialize.eager]] — the output
    * is 3 aggregate rows) and the session confs are restored before
    * returning; semantics are conf-independent (plain inner join +
    * aggregate), which is what the DuckDB oracle checks. */
  private def joinRuntimeBloom(spark: SparkSession, sfDir: String): DataFrame =
    withConfs(spark, RuntimeBloomConfs) {
      Materialize.eager(runtimeBloomPlan(spark, sfDir))
    }

  private def withConfs[T](spark: SparkSession,
      confs: Seq[(String, String)])(body: => T): T = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private val bucketedWritten = scala.collection.concurrent.TrieMap.empty[String, Boolean]

  /** J10 — bucketed co-located fact-fact join: both tables pre-bucketed
    * (8 buckets, sorted) on the join key, so the REPEATED orders⋈lineitem
    * join plans with zero join-key exchanges — at 100 TB this is the
    * layout lever that turns every repeat fact join into co-located
    * streams (BucketingSpec asserts the no-Exchange sort-merge plan with
    * broadcast disabled; at fixture scale the default config may still
    * broadcast, which is also correct). The bucketed write runs once per
    * (JVM, sfDir); the query itself is the join + grouped aggregate,
    * oracle-checked against the plain parquet join. */
  private def joinBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val suffix = sfDir.hashCode.toHexString
    val ot = s"graft_orders_bq_$suffix"
    val lt = s"graft_lineitem_bq_$suffix"
    bucketedWritten.getOrElseUpdate(sfDir, {
      // a managed-table dir surviving from an earlier JVM is unknown to
      // this session's in-memory catalog — clear it before recreating
      for (t <- Seq(ot, lt)) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(new java.io.File(s"spark-warehouse/$t"))
      }
      Tables.orders(spark, sfDir).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(ot)
      Tables.lineitem(spark, sfDir).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(lt)
      true
    })
    spark.table(lt)
      .join(spark.table(ot), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      // exact cent-unit sum (order-independent BIGINT — the double form's
      // accumulation noise crossed the 0.01 quantum at the 100× volume;
      // see Aggs.aggMulti's money-sum note)
      .agg(count(lit(1)).as("n"),
        (sum(round($"l_extendedprice" * 100).cast("long")) / lit(100.0))
          .as("rev"))
      .orderBy($"o_orderstatus")
  }

  override def queries: Map[String, QueryFn] = Map(
    "join_inner"     -> joinInner,
    "join_broadcast" -> joinBroadcast,
    "join_star"      -> joinStar,
    "join_left"      -> joinLeft,
    "join_full"      -> joinFull,
    "join_semi"      -> joinSemi,
    "join_anti"      -> joinAnti,
    "join_range"     -> joinRange,
    "join_range_binned" -> joinRangeBinned,
    "join_interval_overlap" -> joinIntervalOverlap,
    "join_runtime_bloom" -> joinRuntimeBloom,
    "join_asof"      -> joinAsof,
    "join_asof_native" -> joinAsofNative,
    "join_asof_native_forward" ->
      joinAsofNativeDir("forward", None, "next_signup_ts") _,
    "join_asof_native_nearest" ->
      joinAsofNativeDir("nearest", None, "nearest_signup_ts") _,
    "join_asof_native_tolerance" ->
      joinAsofNativeDir("backward", Some(72L * 3600 * 1000000), "last_signup_ts") _,
    "join_asof_forward" -> joinAsofForward,
    "join_asof_tolerance" -> joinAsofTolerance,
    "join_asof_nearest" -> joinAsofNearest,
    "join_cross"     -> joinCross,
    "join_skew_salted" -> joinSkewSalted,
    "join_bucketed"  -> joinBucketed
  )

  /** Window-form as-of oracle replays (round-11 oracle-capability fix):
    * the original pair-join replays (`p JOIN s ON user AND s.ts <= p.ts`
    * then argmin/argmax) are quadratic IN THE KEY GROUP — at the
    * 100×-Zipf corpus the hot user's |purchases|·|signups| intermediate
    * exploded past 50 GB of DuckDB spill and ENOSPC'd the campaign (the
    * same skew law that bit the Spark side's unbounded-following frame).
    * These mirror the Spark plans' linear formulation instead: one
    * windowed pass with running max (backward) / frame min (forward) —
    * DuckDB evaluates aggregate windows with segment trees, O(n log n)
    * regardless of skew. Tie keys mirror the Spark windows exactly
    * (signup sorts before purchase at equal ts for at-or-BEFORE, after
    * for at-or-AFTER, then event_id). */
  private val AsofEventsCte =
    """WITH e AS (
      |  SELECT event_id, user_id, ts, event_type,
      |         CASE WHEN event_type = 'signup' THEN ts END AS signup_ts
      |  FROM events WHERE event_type IN ('signup', 'purchase')),
      |w AS (
      |  SELECT event_id, user_id, ts, event_type,
      |    max(signup_ts) OVER (
      |      PARTITION BY user_id
      |      ORDER BY ts, CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
      |    min(signup_ts) OVER (
      |      PARTITION BY user_id
      |      ORDER BY ts, CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END, event_id
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
      |  FROM e)""".stripMargin

  private val AsofBackwardSql =
    s"""$AsofEventsCte
       |SELECT event_id, user_id, prev_ts AS last_signup_ts
       |FROM w WHERE event_type = 'purchase' AND prev_ts IS NOT NULL
       |ORDER BY event_id""".stripMargin

  private val AsofForwardSql =
    s"""$AsofEventsCte
       |SELECT event_id, user_id, next_ts AS next_signup_ts
       |FROM w WHERE event_type = 'purchase' AND next_ts IS NOT NULL
       |ORDER BY event_id""".stripMargin

  private val AsofToleranceSql =
    s"""$AsofEventsCte
       |SELECT event_id, user_id, prev_ts AS last_signup_ts
       |FROM w WHERE event_type = 'purchase' AND prev_ts IS NOT NULL
       |  AND prev_ts >= ts - INTERVAL 72 HOUR
       |ORDER BY event_id""".stripMargin

  private val AsofNearestSql =
    s"""$AsofEventsCte
       |SELECT event_id, user_id,
       |  CASE WHEN prev_ts IS NULL THEN next_ts
       |       WHEN next_ts IS NULL THEN prev_ts
       |       WHEN ts - prev_ts <= next_ts - ts THEN prev_ts
       |       ELSE next_ts END AS nearest_signup_ts
       |FROM w WHERE event_type = 'purchase'
       |  AND (prev_ts IS NOT NULL OR next_ts IS NOT NULL)
       |ORDER BY event_id""".stripMargin

  override def oracles: Map[String, String] = Map(
    "join_bucketed" ->
      """SELECT o_orderstatus, count(*) AS n,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, p_brand, p_type
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, p_brand, p_type""".stripMargin,
    "join_star" ->
      """SELECT r_name, count(*) AS n_items,
        |       floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |                       (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |             / 100.0 + 0.5) / 100.0 AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_full" ->
      """WITH d1 AS (SELECT CAST(o_orderdate AS DATE) AS d1, count(*) AS n_orders
        |            FROM orders GROUP BY 1),
        |     d2 AS (SELECT CAST(l_shipdate AS DATE) AS d2, count(*) AS n_items
        |            FROM lineitem GROUP BY 1)
        |SELECT coalesce(d1, d2) AS d, n_orders, n_items
        |FROM d1 FULL OUTER JOIN d2 ON d1 = d2
        |ORDER BY d""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "join_range" ->
      """SELECT a.event_id AS a_id, count(*) AS n_follow
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |WHERE a.event_type = 'signup'
        |GROUP BY a.event_id ORDER BY a_id""".stripMargin,
    "join_range_binned" ->
      """SELECT a.event_id AS a_id, count(*) AS n_any
        |FROM events a JOIN events b
        |  ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |WHERE a.event_type = 'signup'
        |GROUP BY a.event_id ORDER BY a_id""".stripMargin,
    "join_interval_overlap" ->
      """WITH p AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS p_lo,
        |         CAST(o_orderdate AS DATE) + 20 AS p_hi
        |  FROM orders WHERE o_totalprice > 480000),
        |s AS (
        |  SELECT CAST(l_shipdate AS DATE) AS s_lo,
        |         CAST(l_shipdate AS DATE) + 7 AS s_hi
        |  FROM lineitem WHERE l_quantity >= 49)
        |SELECT o_orderkey, count(*) AS n_shipments,
        |  CAST(sum(date_diff('day', greatest(p_lo, s_lo), least(p_hi, s_hi)) + 1)
        |       AS BIGINT) AS overlap_days
        |FROM p JOIN s ON s_lo <= p_hi AND p_lo <= s_hi
        |GROUP BY 1 ORDER BY o_orderkey""".stripMargin,
    "join_runtime_bloom" ->
      """SELECT l_returnflag, count(*) AS n,
        |       floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_asof" -> AsofBackwardSql,
    "join_asof_native" -> AsofBackwardSql,
    "join_asof_native_forward" -> AsofForwardSql,
    "join_asof_native_nearest" -> AsofNearestSql,
    "join_asof_native_tolerance" -> AsofToleranceSql,
    "join_asof_tolerance" -> AsofToleranceSql,
    "join_asof_forward" -> AsofForwardSql,
    "join_asof_nearest" -> AsofNearestSql,
    "join_skew_salted" ->
      """SELECT o_orderkey, c_name
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "join_cross" ->
      """SELECT r_regionkey, r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        |ORDER BY r_regionkey, o_orderstatus""".stripMargin
  )
}
