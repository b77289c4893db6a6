package graft

import org.apache.spark.sql.functions._

/** Bucketing (SURVEY.md §7 scale notes): pre-partitioning both sides of a
  * repeated join on the join key removes the per-query shuffle entirely —
  * at 100 TB this converts every orders⋈lineitem into a zero-exchange
  * sort-merge over co-located buckets.
  */
class BucketingSpec extends SparkSpec {
  import SparkSpec.session.implicits._

  test("bucketed tables join WITHOUT a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    // the in-memory catalog is fresh per JVM, but managed-table locations
    // from an earlier run may survive on disk — clear them
    for (t <- Seq("graft_orders_b", "graft_lineitem_b")) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(s"spark-warehouse/$t"))
    }
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_orders_b")
    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_lineitem_b")

    // the fixture tables are tiny enough to auto-broadcast, which would
    // bypass the bucketed path — disable broadcast to exercise the
    // co-located sort-merge the layout exists for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_lineitem_b")
        .join(spark.table("graft_orders_b"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"))
      val got = joined.orderBy($"o_orderstatus").collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce an Exchange: both sides are
      // co-located by bucket (the single post-agg exchange is expected)
      assert(plan.contains("SortMergeJoin"), plan)
      val joinKeyExchanges = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)"
        .r.findAllIn(plan).size
      assert(joinKeyExchanges === 0,
        s"bucketed join must not shuffle on the join key:\n$plan")

      // same result as the unbucketed join
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy($"o_orderstatus").collect()
      assert(got.toSeq === expected.toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
