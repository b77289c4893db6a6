package graft

import graft.tools.Fuzz

/** The differential fuzzer's in-suite contract: generation is
  * deterministic per seed (the recorded gate runs are reproducible), and
  * a sample of generated cases actually EXECUTES on Spark (the DuckDB
  * half runs driver-side via tools/check_oracle.py — the recorded runs:
  * seeds 11 and 42, 200 cases each, 400/400 PASS after the first run
  * exposed the fixture's non-unique (l_orderkey, l_linenumber) and the
  * grammar's order-totality was fixed — BASELINE.md round-11 row).
  */
class FuzzSpec extends SparkSpec {

  test("case generation is deterministic per seed and seed-sensitive") {
    val a = Fuzz.cases(11L, 50)
    val b = Fuzz.cases(11L, 50)
    assert(a == b)
    assert(a.map(_._1).distinct.size == 50)
    assert(Fuzz.cases(42L, 50) != a)
  }

  test("every generated query shape parses and executes on Spark") {
    for (t <- Seq("customer", "orders", "lineitem"))
      Tables.table(spark, sf, t).createOrReplaceTempView(t)
    Tables.events(spark, sf)
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      .createOrReplaceTempView("events")
    // 30 cases cover all eight grammar shapes (incl. the round-12 outer
    // join / EXISTS / window-frame / null-dense extensions) with high
    // probability; count() forces full execution, not just analysis.
    Fuzz.cases(7L, 30).foreach { case (name, sql) =>
      withClue(s"$name:\n$sql\n") { spark.sql(sql).count() }
    }
  }
}
