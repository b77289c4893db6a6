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

  // (the agg_hll_sketch / filter_bloom / agg_count_min BOUND tests live in
  // ApproxContractSpec; this spec keeps the structural/merge/format
  // properties the bounds don't cover)

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
