package graft

import org.apache.spark.sql.functions._

/** Semantics tests for the round-2 operator families: TPC-H composites,
  * subqueries/lateral/recursive CTE, stats aggregates, time-series fill,
  * tf-idf, and dup-cluster connected components. The oracle gate proves
  * engine parity at sf0.01; these pin the SEMANTICS on small literal data
  * where the expected answer is computable by hand.
  */
class AdvancedSqlSpec extends SparkSpec {

  test("tpch_q1 aggregates only rows within the shipdate cutoff") {
    val out = SparkEntry.queries("tpch_q1")(spark, sf)
    assert(out.columns.toSeq == Seq("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
      "avg_disc", "count_order"))
    val total = out.agg(sum("count_order")).first().getLong(0)
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp")).count()
    assert(total == expected)
  }

  test("tpch_q3 returns at most 10 rows ordered by revenue desc") {
    val rows = SparkEntry.queries("tpch_q3")(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("tpch_q5 restricts to ASIA nations") {
    import spark.implicits._
    val nations = SparkEntry.queries("tpch_q5")(spark, sf)
      .select($"n_name").as[String].collect().toSet
    val asia = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_name").as[String].collect().toSet
    assert(nations.subsetOf(asia))
  }

  test("sub_scalar_corr decorrelates: matches manual per-key avg join") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val avgQ = li.groupBy($"l_partkey".as("pk")).agg(avg($"l_quantity").as("aq"))
    val manual = li.join(avgQ, $"l_partkey" === $"pk")
      .filter($"l_quantity" < $"aq" * 0.5)
      .groupBy($"l_partkey").agg(count(lit(1)).as("n_small"))
    val q = SparkEntry.queries("sub_scalar_corr")(spark, sf)
    assert(q.count() == manual.count())
    assert(q.except(manual.select($"l_partkey", $"n_small")).isEmpty)
  }

  test("join_lateral equals groupBy-then-join formulation") {
    import spark.implicits._
    // LATERAL with a scalar aggregate emits a row even when the correlated
    // set is empty (count = 0, max = null) — hence LEFT join + coalesce.
    val expected = Tables.orders(spark, sf).filter($"o_totalprice" > 450000)
      .join(Tables.lineitem(spark, sf)
          .groupBy($"l_orderkey")
          .agg(count(lit(1)).as("ni"), max($"l_quantity").as("max_qty")),
        $"o_orderkey" === $"l_orderkey", "left_outer")
      .select($"o_orderkey", coalesce($"ni", lit(0L)).as("n_items"), $"max_qty")
    val got = SparkEntry.queries("join_lateral")(spark, sf)
    assert(got.count() == expected.count())
    assert(got.except(expected).isEmpty)
  }

  test("cte_recursive yields exactly months 1..12 with non-negative counts") {
    val rows = SparkEntry.queries("cte_recursive")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 12))
    assert(rows.forall(_.getLong(1) >= 0))
  }

  test("agg_grouping_id: gid 0 = detail, 1 = per-flag subtotal, 3 = grand total") {
    import spark.implicits._
    val out = SparkEntry.queries("agg_grouping_id")(spark, sf).collect()
    val grand = out.filter(_.getAs[Long]("gid") == 3)
    assert(grand.length == 1 && grand.head.getAs[String]("rf") == "ALL")
    val detailSum = out.filter(_.getAs[Long]("gid") == 0).map(_.getAs[Long]("n")).sum
    assert(detailSum == grand.head.getAs[Long]("n"))
  }

  test("agg_width_bucket buckets partition all rows") {
    val out = SparkEntry.queries("agg_width_bucket")(spark, sf)
    val total = out.agg(sum("n")).first().getLong(0)
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("agg_mode_median median sits between min and max per group") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val bounds = li.groupBy($"l_linestatus")
      .agg(min($"l_quantity").as("lo"), max($"l_quantity").as("hi"))
    SparkEntry.queries("agg_mode_median")(spark, sf)
      .join(bounds, "l_linestatus").collect().foreach { r =>
        val m = r.getAs[Double]("med_qty")
        assert(m >= r.getAs[Double]("lo") && m <= r.getAs[Double]("hi"))
      }
  }

  test("ts_cusum_changepoint matches the naive sequential recurrence") {
    import spark.implicits._
    // the query computes S via the closed form P_i - min(0, min_j P_j);
    // replay the textbook recurrence S_i = max(0, S_{i-1} + d_i) in plain
    // scala over the same integer-micro inputs and demand exact agreement
    val out = SparkEntry.queries("ts_cusum_changepoint")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(3),
        r.getBoolean(4)))
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(floor(avg($"value") * 1e6 + 0.5).cast("long").as("x_m"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    for ((tpe, series) <- daily.groupBy(_._1)) {
      val xs = series.sortBy(_._2).map(x => (x._2, x._3))
      val mu = math.floor(xs.map(_._2).sum.toDouble / xs.length + 0.5).toLong
      val sd = math.floor(math.sqrt(
        xs.map(x => math.pow((x._2 - mu).toDouble, 2)).sum / xs.length) + 0.5).toLong
      var s = 0L
      val expect = xs.map { case (day, x) =>
        s = math.max(0L, s + (x - mu - sd / 2))
        (day, s)
      }.toMap
      out.filter(_._1 == tpe).foreach { case (_, day, cusum, flag) =>
        // sd micro-rounds off avg/stddev_pop floats; the naive replay can
        // land one micro off on mu/sd, shifting S by at most days*1 micros
        assert(math.abs(cusum * 1e6 - expect(day)) <= 2L * xs.length + 2,
          s"$tpe $day: closed form ${cusum * 1e6} vs recurrence ${expect(day)}")
        assert(cusum >= 0.0, s"$tpe $day: CUSUM is non-negative by construction")
        if (flag) assert(cusum * 1e6 > 4L * sd,
          s"$tpe $day: flagged below threshold")
      }
    }
  }

  test("ts_gapfill emits a dense day*type grid with zero-filled gaps") {
    import spark.implicits._
    val out = SparkEntry.queries("ts_gapfill")(spark, sf)
    val e = Tables.events(spark, sf)
    val days = e.select(datediff(to_date(max($"ts")), to_date(min($"ts"))))
      .first().getInt(0) + 1
    val nTypes = e.select($"event_type").distinct().count()
    assert(out.count() == days * nTypes)
    // totals preserved
    assert(out.agg(sum("n")).first().getLong(0) == e.count())
  }

  test("ts_fill_forward carries the last purchase value, null before the first") {
    import spark.implicits._
    val out = SparkEntry.queries("ts_fill_forward")(spark, sf)
    // For each user's first purchase event, fwd must equal its own value (rounded).
    val e = Tables.events(spark, sf)
    val firstPurchase = e.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min(struct($"ts", $"event_id")).as("f"))
      .select($"user_id".as("u"), $"f.event_id".as("eid"))
    val joined = out.join(firstPurchase, out("event_id") === $"eid")
      .join(e.select($"event_id".as("eid2"), $"value"), $"eid" === $"eid2")
    joined.collect().foreach { r =>
      val fwd = r.getAs[Double]("fwd")
      val v = r.getAs[Double]("value")
      assert(math.abs(fwd - v) < 1e-4)
    }
  }

  test("text_tfidf: corpus-wide terms get zero idf, rare terms rank first") {
    import spark.implicits._
    val out = SparkEntry.queries("text_tfidf")(spark, sf)
    // df == n_docs => idf = ln(1) = 0 => never outranks a rarer term with tf>0
    val nDocs = Tables.documents(spark, sf).filter($"doc_id" < 100).count()
    out.filter($"df" === nDocs).collect().foreach { r =>
      assert(r.getAs[Double]("tfidf") == 0.0)
    }
    // rn is 1..3 per doc
    val byDoc = out.groupBy($"doc_id").agg(collect_list($"rn").as("rns"))
    byDoc.collect().foreach { r =>
      val rns = r.getSeq[Long](1).sorted
      assert(rns == (1L to rns.length))
    }
  }

  test("dedup_clusters: labels are transitive (chain collapses to one cluster)") {
    import spark.implicits._
    // hand-built graph via the same propagation loop semantics: verify on
    // the real output that every cluster label is the min doc_id of its
    // member set and labels are closed under the pair relation.
    val out = SparkEntry.queries("dedup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cluster id must be <= member id and itself a member of the same cluster
    out.foreach { case (id, c) =>
      assert(c <= id)
      assert(out(c) == c, s"cluster rep $c of $id must be its own rep")
    }
  }

  test("agg_stats variance relations: sd^2 ~ var, pop <= samp") {
    SparkEntry.queries("agg_stats")(spark, sf).collect().foreach { r =>
      val sdS = r.getAs[Double]("sd_samp"); val vS = r.getAs[Double]("v_samp")
      assert(math.abs(sdS * sdS - vS) < 0.01 * math.max(1.0, vS))
      assert(r.getAs[Double]("v_pop") <= vS)
    }
  }

  test("agg_regr slope/intercept reproduce avgy = slope*avgx + intercept") {
    SparkEntry.queries("agg_regr")(spark, sf).collect().foreach { r =>
      val pred = r.getAs[Double]("slope") * r.getAs[Double]("avgx") +
        r.getAs[Double]("intercept")
      assert(math.abs(pred - r.getAs[Double]("avgy")) < 0.01 * math.abs(r.getAs[Double]("avgy")))
    }
  }
}
