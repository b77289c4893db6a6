package graft

import org.apache.spark.sql.functions._
import graft.table.{GraftTable, MaterializedAgg}

/** Incremental materialized-aggregate maintenance ([[MaterializedAgg]]):
  * the MV must equal a full recompute of the final source snapshot after
  * ANY mix of appends, deletes, and merges — per-group counts, SQL NULL
  * sum semantics, NULL group keys, vanished groups — while each refresh
  * reads only the change feed, never the source table. */
class MaterializedAggSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mv_$tag").toString

  private def recompute(t: GraftTable) = {
    val df = spark.read.format("graft").load(t.root)
    df.groupBy(col("g")).agg(count(lit(1)).as("cnt"),
      sum(col("v")).as("sum_v"),
      avg(col("v")).as("avg_v"))
  }

  private def viewOf(mvRoot: String) =
    MaterializedAgg.readView(spark, mvRoot, Seq("g"), Seq("v"))

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("g")).collect().map(_.toSeq).toSeq

  test("init + incremental refresh across delete/merge/append equals a " +
      "full recompute; no-op and already-current refreshes are cheap") {
    import spark.implicits._
    val dir = tmp("e2e")
    val src = GraftTable.create(spark, s"$dir/src",
      (0L until 60L).map(i => (i, s"g${i % 3}", i * 10L)).toDF("id", "g", "v"))
    val mvRoot = s"$dir/mv"

    // ---- init: full aggregate of the pinned snapshot
    val v1 = MaterializedAgg.refresh(spark, src, mvRoot, Seq("g"), Seq("v"))
    assert(v1 == src.latestVersion)
    assert(sorted(viewOf(mvRoot)) ==
      sorted(recompute(src).select(col("g"), col("cnt"),
        col("sum_v"), col("avg_v"))))

    // ---- churn: delete one group's slice, merge rows ACROSS groups
    // (CDF delete+insert pairs move counts between groups), append new
    src.deleteWhere(col("g") === "g0" && col("id") < 30L)
    src.mergeUpsert(
      (0L until 60L).filter(_ % 3 == 1).map(i => (i, "g2", i * 10L))
        .toDF("id", "g", "v"), Seq("id"))
    src.append(Seq((100L, "g9", 5L), (101L, "g9", 7L)).toDF("id", "g", "v"))

    val v2 = MaterializedAgg.refresh(spark, src, mvRoot, Seq("g"), Seq("v"))
    assert(v2 == src.latestVersion && v2 > v1)
    val mv = GraftTable.forPath(spark, mvRoot)
    assert(mv.commitAt(mv.latestVersion).operation == "mv_refresh")
    assert(sorted(viewOf(mvRoot)) ==
      sorted(recompute(src).select(col("g"), col("cnt"),
        col("sum_v"), col("avg_v"))))

    // ---- already current: pure no-op, not even a commit
    val before = mv.latestVersion
    assert(MaterializedAgg.refresh(spark, src, mvRoot, Seq("g"), Seq("v")) == v2)
    assert(mv.latestVersion == before)

    // ---- change-free source churn (compaction): zero-IO stamp advance
    src.compact(1000000L)
    val v3 = MaterializedAgg.refresh(spark, src, mvRoot, Seq("g"), Seq("v"))
    assert(v3 == src.latestVersion)
    assert(mv.commitAt(mv.latestVersion).operation == "mv_noop")
    assert(mv.commitAt(mv.latestVersion).files ==
      mv.commitAt(before).files, "a no-op refresh must not rewrite the MV")
    assert(sorted(viewOf(mvRoot)) ==
      sorted(recompute(src).select(col("g"), col("cnt"),
        col("sum_v"), col("avg_v"))))
  }

  test("SQL NULL semantics survive incrementality: all-NULL sums read back " +
      "NULL, NULL group keys are real groups, emptied groups vanish") {
    import spark.implicits._
    val dir = tmp("nulls")
    val src = GraftTable.create(spark, s"$dir/src",
      Seq((1L, Some("a"), Option.empty[Long]), // 'a': only NULL values
          (2L, Some("a"), Option.empty[Long]),
          (3L, Option.empty[String], Some(7L)), // NULL group key
          (4L, Some("b"), Some(1L)),
          (5L, Some("b"), Some(2L))).toDF("id", "g", "v"))
    val mvRoot = s"$dir/mv"
    MaterializedAgg.refresh(spark, src, mvRoot, Seq("g"), Seq("v"))

    def viewMap() = viewOf(mvRoot).collect()
      .map(r => Option(r.get(0)).map(_.toString).orNull ->
        (r.getLong(1), Option(r.get(2)))).toMap

    assert(viewMap() == Map("a" -> (2L, None),
      (null: String) -> (1L, Some(7L)), "b" -> (2L, Some(3L))))

    // delete the NULL-group row (group vanishes), give 'a' a real value
    // (sum un-NULLs), empty 'b' entirely
    src.deleteWhere(col("g").isNull || col("g") === "b")
    src.append(Seq((6L, "a", 5L)).toDF("id", "g", "v"))
    MaterializedAgg.refresh(spark, src, mvRoot, Seq("g"), Seq("v"))
    assert(viewMap() == Map("a" -> (3L, Some(5L))))

    // and the reverse direction: the only non-NULL contributor leaves,
    // the group must read back NULL again (nn hit zero) — the case a
    // coalesced running total alone cannot represent
    src.deleteWhere(col("id") === 6L)
    MaterializedAgg.refresh(spark, src, mvRoot, Seq("g"), Seq("v"))
    assert(viewMap() == Map("a" -> (2L, None)))
  }

  test("continuous refresh: the streaming wrapper keeps the MV equal to a " +
      "recompute across appends and deletes, and absorbs a restart") {
    import spark.implicits._
    val dir = tmp("stream")
    val src = GraftTable.create(spark, s"$dir/src",
      (0L until 30L).map(i => (i, s"g${i % 3}", i)).toDF("id", "g", "v"))
    val mvRoot = s"$dir/mv"
    def drive(): Unit = {
      val q = MaterializedAgg.continuousRefresh(spark, src, mvRoot,
        Seq("g"), Seq("v"), s"$dir/chk")
      try q.processAllAvailable() finally q.stop()
    }
    drive()
    assert(sorted(viewOf(mvRoot)) ==
      sorted(recompute(src).select(col("g"), col("cnt"),
        col("sum_v"), col("avg_v"))))
    // churn while the stream is DOWN, then a restarted stream catches up
    src.append(Seq((100L, "g9", 5L)).toDF("id", "g", "v"))
    src.deleteWhere(col("g") === "g1")
    drive()
    assert(sorted(viewOf(mvRoot)) ==
      sorted(recompute(src).select(col("g"), col("cnt"),
        col("sum_v"), col("avg_v"))))
    val mv = GraftTable.forPath(spark, mvRoot)
    val ops = (1L to mv.latestVersion).map(v => mv.commitAt(v).operation)
    assert(ops.head == "mv_init" && ops.tail.forall(
      o => o == "mv_refresh" || o == "mv_noop"), s"unexpected MV ops: $ops")
  }

  test("a target built under a different aggregate spec is refused") {
    import spark.implicits._
    val dir = tmp("spec")
    val src = GraftTable.create(spark, s"$dir/src",
      Seq((1L, "a", 2L)).toDF("id", "g", "v"))
    val mvRoot = s"$dir/mv"
    MaterializedAgg.refresh(spark, src, mvRoot, Seq("g"), Seq("v"))
    src.append(Seq((2L, "b", 3L)).toDF("id", "g", "v"))
    val e = intercept[IllegalStateException] {
      MaterializedAgg.refresh(spark, src, mvRoot, Seq("g"), Seq.empty)
    }
    assert(e.getMessage.contains("spec"))
  }
}
