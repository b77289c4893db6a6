package graft

import org.apache.spark.sql.functions._

/** Behavioral invariants for the round-5 closing operators: the DQ
  * constraint suite detects (not just vacuously passes), the z-order
  * bucket boxes actually bound both dimensions (the property scan
  * pruning rides on), EWMA respects convexity, z-scores are standardized,
  * and BM25 ranks saturating term frequency sensibly. */
class QualityLayoutSpec extends SparkSpec {
  import SparkSpec.session.implicits._

  test("dq_constraints: outlier-cap rule fires, all structural rules pass") {
    val rows = SparkEntry.queries("dq_constraints")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rows("value_outlier_cap") === false, "canary rule must detect")
    for ((rule, passed) <- rows if rule != "value_outlier_cap")
      assert(passed, s"structural rule $rule unexpectedly violated")
  }

  test("dq_profile: row count and null-free fixture invariants") {
    val rows = SparkEntry.queries("dq_profile")(spark, sf).collect()
    assert(rows.length === 6)
    for (r <- rows) {
      assert(r.getAs[Long]("n_null") === 0L, s"${r.getString(0)} nulls")
      assert(r.getAs[Long]("n_distinct") > 0L)
    }
  }

  test("layout_zorder: every bucket bounds BOTH dimensions (pruning property)") {
    val rows = SparkEntry.queries("layout_zorder")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (uMin, uMax) = (r.getAs[Long]("u_min"), r.getAs[Long]("u_max"))
      val (dMin, dMax) = (r.getAs[Long]("d_min"), r.getAs[Long]("d_max"))
      // a 256-key z bucket covers a 16x16 Morton tile: user span ≤ 16
      // cells, day span ≤ 16 cells — no bucket smears across either axis
      assert(uMax - uMin < 16, s"bucket ${r.getLong(0)} user span")
      assert(dMax - dMin < 16, s"bucket ${r.getLong(0)} day span")
    }
  }

  test("Observation collects DQ metrics during a real job — no extra pass") {
    // the zero-cost companion to dq_profile/dq_constraints: piggyback
    // metrics on a job that runs anyway (here: a curated write), instead
    // of a dedicated profiling scan
    val obs = new org.apache.spark.sql.Observation("dq")
    val dir = java.nio.file.Files.createTempDirectory("graft_obs").toString
    Tables.events(spark, sf)
      .observe(obs,
        count(lit(1)).as("n"),
        sum($"value".isNull.cast("long")).as("n_null_value"),
        max($"value").as("max_value"))
      .write.mode("overwrite").parquet(s"$dir/out")
    val m = obs.get
    val n = Tables.events(spark, sf).count()
    assert(m("n") === n)
    assert(m("n_null_value") === 0L)
    assert(m("max_value").asInstanceOf[Double] > 0.0)
  }

  test("ts_ewma: smoothed value is a convex combination of the user's window values") {
    val ewma = SparkEntry.queries("ts_ewma")(spark, sf)
    val bounds = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(min($"value").as("lo"), max($"value").as("hi"))
    val out = ewma.join(bounds, "user_id")
      .filter($"ewma" < $"lo" - 0.001 || $"ewma" > $"hi" + 0.001)
    assert(out.count() === 0L)
  }

  test("ts_zscore_outlier: all reported rows clear the threshold") {
    val rows = SparkEntry.queries("ts_zscore_outlier")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) assert(math.abs(r.getAs[Double]("z")) > 1.5)
  }

  test("multimodal_phash_dedup: pairs canonical (a<b), within radius, no duplicates") {
    val rows = SparkEntry.queries("multimodal_phash_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length === pairs.length)
    assert(rows.forall(_.getAs[Long]("hamming") <= 6L))
  }

  test("embed_random_projection: norms preserved in expectation (JL contract)") {
    val z = SparkEntry.queries("embed_random_projection")(spark, sf)
      .groupBy($"vec_id").agg(sum($"z" * $"z").as("zn"))
    val vn = Tables.embeddings(spark, sf)
      .select($"vec_id", expr(
        "aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))").as("vn"))
    val ratios = z.join(vn, "vec_id")
      .select(($"zn" / $"vn").as("r")).collect().map(_.getDouble(0))
    val mean = ratios.sum / ratios.length
    // E[||z||^2] = ||v||^2 for a ±1/√k JL matrix; per-vector spread is
    // wide at k=16 but the corpus mean concentrates hard
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean")
    assert(ratios.forall(r => r > 0.1 && r < 4.0), "per-vector distortion blew the JL tail bound")
  }

  test("curation_shard_balance: token loads within 5% across shards") {
    val rows = SparkEntry.queries("curation_shard_balance")(spark, sf).collect()
    assert(rows.length === 8)
    val loads = rows.map(_.getAs[Long]("total_tokens").toDouble)
    assert(loads.max / loads.min < 1.05,
      s"LPT round-robin should balance: ${loads.mkString(",")}")
    val docs = rows.map(_.getAs[Long]("n_docs"))
    assert(docs.max - docs.min <= 1, "doc counts differ by more than the remainder")
  }

  test("layout_compaction: physical rewrite follows the plan and loses no rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact")
      .toFile.getAbsolutePath
    val day = Tables.events(spark, sf)
      .filter(to_date($"ts") === lit("2024-01-03"))
    val nIn = day.count()
    // land the day as 24 micro-batch files (the consumer's hourly grain)
    day.repartition(24).write.mode("overwrite").parquet(s"$tmp/small")
    def files(p: String) = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files(s"$tmp/small") === 24)
    // output file count the declared plan assigns for this day
    val nOut = SparkEntry.queries("layout_compaction")(spark, sf)
      .filter($"d" === lit("2024-01-03"))
      .agg(max($"target_file")).head.getLong(0).toInt + 1
    spark.read.parquet(s"$tmp/small").repartition(nOut)
      .write.mode("overwrite").parquet(s"$tmp/compacted")
    assert(files(s"$tmp/compacted") === nOut)
    assert(nOut < 24, "compaction must reduce the file count")
    val out = spark.read.parquet(s"$tmp/compacted")
    assert(out.count() === nIn)
    assert(out.select($"event_id").exceptAll(day.select($"event_id")).isEmpty)
  }

  test("join_interval_overlap: binned plan equals the naive inequality join") {
    import org.apache.spark.sql.functions.{sum => fsum}
    val binned = SparkEntry.queries("join_interval_overlap")(spark, sf)
    val p = Tables.orders(spark, sf).filter($"o_totalprice" > 480000.0)
      .select($"o_orderkey", to_date($"o_orderdate").as("p_lo"),
        date_add(to_date($"o_orderdate"), 20).as("p_hi"))
    val s = Tables.lineitem(spark, sf).filter($"l_quantity" >= 49)
      .select(to_date($"l_shipdate").as("s_lo"),
        date_add(to_date($"l_shipdate"), 7).as("s_hi"))
    val naive = p.join(s, $"s_lo" <= $"p_hi" && $"p_lo" <= $"s_hi")
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_shipments"),
        fsum(datediff(least($"p_hi", $"s_hi"), greatest($"p_lo", $"s_lo")) + 1)
          .cast("bigint").as("overlap_days"))
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    assert(binned.count() > 0)
  }

  test("ts_interpolate_linear: interior fills lie between their endpoints") {
    val rows = SparkEntry.queries("ts_interpolate_linear")(spark, sf).collect()
    assert(rows.exists(_.getAs[Boolean]("was_gap")), "fixture must have gaps")
    // group by type, walk the series: every was_gap value must sit within
    // [min(prev known, next known), max(...)] — the convexity contract
    for ((_, series) <- rows.groupBy(_.getString(1))) {
      val vs = series.sortBy(_.getTimestamp(0).getTime)
        .map(r => (Option(r.getAs[java.lang.Double]("v_interp")),
          r.getAs[Boolean]("was_gap")))
      for (i <- vs.indices if vs(i)._2 && vs(i)._1.isDefined) {
        val prevKnown = (i - 1 to 0 by -1).collectFirst {
          case j if !vs(j)._2 && vs(j)._1.isDefined => vs(j)._1.get.doubleValue }
        val nextKnown = (i + 1 until vs.length).collectFirst {
          case j if !vs(j)._2 && vs(j)._1.isDefined => vs(j)._1.get.doubleValue }
        assert(prevKnown.isDefined && nextKnown.isDefined,
          "interpolated point without both endpoints")
        val (lo, hi) = (math.min(prevKnown.get, nextKnown.get),
          math.max(prevKnown.get, nextKnown.get))
        val v = vs(i)._1.get.doubleValue
        assert(v >= lo - 1e-4 && v <= hi + 1e-4,
          s"interpolated $v outside [$lo, $hi]")
      }
    }
  }

  test("text_bm25: scores positive, descending, and bounded by the idf sum") {
    val rows = SparkEntry.queries("text_bm25")(spark, sf)
      .collect().map(_.getAs[Double]("bm25"))
    assert(rows.nonEmpty)
    assert(rows.forall(_ > 0.0))
    assert(rows.sameElements(rows.sorted(Ordering[Double].reverse)))
    // tf/(tf + k1·norm) < 1 ⇒ each term contributes < idf·(k1+1); with
    // 3 query terms and idf ≤ ln(1 + (N+0.5)/0.5) the total is bounded
    val nDocs = Tables.documents(spark, sf).count()
    val cap = 3 * 2.2 * math.log(1 + (nDocs + 0.5) / 0.5)
    assert(rows.forall(_ < cap))
  }
}
