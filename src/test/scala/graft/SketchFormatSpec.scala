package graft

import org.apache.spark.sql.functions._

/** Semantics of the sketch structures (rel.Sketches) and the multi-format
  * round-trips (rel.Formats) — the properties the DuckDB oracle can't state:
  * HLL error bounds, bloom no-false-negative guarantees, and byte-exact
  * format fidelity beyond the aggregated verdict.
  */
class SketchFormatSpec extends SparkSpec {
  import SparkSpec.session.implicits._

  test("bitmap distinct count equals exact count(distinct) per group") {
    val bm = SparkEntry.queries("agg_bitmap_distinct")(spark, sf)
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"))
    val joined = bm.join(exact, "event_type")
    assert(joined.filter($"n_distinct_users" =!= $"exact").count() === 0)
  }

  test("HLL sketch estimate is within 5% of exact per group") {
    val est = SparkEntry.queries("agg_hll_sketch")(spark, sf)
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").cast("double").as("exact"))
    val bad = est.join(exact, "event_type")
      .filter(abs($"approx_users" - $"exact") / $"exact" > 0.05)
    assert(bad.count() === 0)
  }

  test("HLL union of partial sketches equals the unpartitioned sketch estimate") {
    val ev = Tables.events(spark, sf)
    val merged = ev
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head().getLong(0)
    val direct = ev
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").as("est"))
      .head().getLong(0)
    assert(merged === direct)
  }

  test("bloom filter has zero false negatives and fp-rate near configured") {
    val row = SparkEntry.queries("filter_bloom")(spark, sf).head()
    val nProbed = row.getAs[Long]("n_probed")
    val nHits = row.getAs[Long]("n_hits")
    val nTrue = row.getAs[Long]("n_true_members")
    val nFp = row.getAs[Long]("n_false_pos")
    assert(nHits === nTrue + nFp) // hits decompose exactly
    assert(nHits >= nTrue)        // no false negatives, ever
    val nonMembers = nProbed - nTrue
    if (nonMembers > 1000)        // fp-rate within 5x of the configured 1%
      assert(nFp.toDouble / nonMembers < 0.05)
  }

  test("CSV and ORC round-trips are row-exact, not just aggregate-exact") {
    // the declared queries compare aggregates; here compare full contents
    val src = Tables.lineitem(spark, sf)
      .filter(pmod($"l_orderkey", lit(20)) === 0)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice",
        $"l_returnflag", $"l_shipdate")
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_spec").toString
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    src.write.mode("overwrite").orc(s"$dir/orc")
    val csvBack = spark.read
      .schema(src.schema).option("header", "true").csv(s"$dir/csv")
    val orcBack = spark.read.orc(s"$dir/orc")
    assert(csvBack.exceptAll(src).count() === 0 && src.exceptAll(csvBack).count() === 0)
    assert(orcBack.exceptAll(src).count() === 0 && src.exceptAll(orcBack).count() === 0)
  }

  test("count-min estimates obey the CMS contract: >= exact, <= exact + eps*N") {
    val est = SparkEntry.queries("agg_count_min")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    assert(est.keySet === exact.keySet)
    for ((t, e) <- est; ex = exact(t)) {
      assert(e >= ex, s"$t: CMS must never underestimate ($e < $ex)")
      assert(e <= ex + math.ceil(0.001 * total).toLong + 1,
        s"$t: estimate $e blew the eps*N bound over exact $ex")
    }
  }

  test("cms_estimate is SQL-registered and probes a count_min_sketch built in SQL") {
    graft.functions.CmsEstimate.register(spark)
    Tables.events(spark, sf).createOrReplaceTempView("graft_cms_events")
    val sqlEst = spark.sql(
      """SELECT cms_estimate(sk, 'click') AS est FROM (
        |  SELECT count_min_sketch(event_type, 0.001d, 0.99d, 1) AS sk
        |  FROM graft_cms_events)""".stripMargin).head.getLong(0)
    val exact = Tables.events(spark, sf).filter($"event_type" === "click").count()
    assert(sqlEst >= exact, s"CMS must never underestimate ($sqlEst < $exact)")
  }

  test("variant path extraction agrees with the string JSON path") {
    val v = SparkEntry.queries("variant_funcs")(spark, sf)
      .select($"event_id", $"k_int")
    val s = Tables.events(spark, sf)
      .select($"event_id", get_json_object($"props", "$.k").cast("long").as("k_int"))
    assert(v.exceptAll(s).count() === 0 && s.exceptAll(v).count() === 0)
  }
}
