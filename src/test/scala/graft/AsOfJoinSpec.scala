package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._

/** Unit semantics for the native whole-operator as-of join
  * (`graft.plans.AsOfJoinExec`) on hand-built frames — the edges the
  * fixture query can't pin down deterministically: inclusivity at equal
  * timestamps, unmatched-left drops, NULL key/time behavior, shared
  * matches, multi-column keys, and 1:1 agreement with the union+window
  * formulation on the real fixture. */
class AsOfJoinSpec extends SparkSpec {

  private def leftDf = {
    import spark.implicits._
    Seq(
      (1L, 10L, "l-a"),   // equal-ts match: right at t=10 is inclusive
      (1L, 5L, "l-b"),    // before any right row for key 1 -> dropped
      (2L, 100L, "l-c"),  // matches right (2, 40): latest <= 100
      (2L, 41L, "l-d"),   // same match as l-c (shared candidate)
      (3L, 50L, "l-e")    // key with no right rows at all -> dropped
    ).toDF("k", "t", "l_tag")
  }

  private def rightDf = {
    import spark.implicits._
    Seq(
      (1L, 10L, "r-a"),
      (2L, 40L, "r-b"),
      (2L, 101L, "r-c"),  // after both left rows of key 2 -> never matches
      (4L, 1L, "r-d")     // key with no left rows
    ).toDF("rk", "rt", "r_tag")
  }

  test("backward-inclusive match, unmatched-left drop, shared candidates") {
    val out = AsOf.join(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt")
      .select("l_tag", "r_tag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set("l-a" -> "r-a", "l-c" -> "r-b", "l-d" -> "r-b"))
  }

  test("NULL keys and NULL times never match on either side") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(10L), "ok"), (None, Some(10L), "nullkey"),
      (Some(1L), None, "nulltime")).toDF("k", "t", "l_tag")
    val r = Seq((Some(1L), Some(5L), "match"), (None, Some(1L), "rnullkey"),
      (Some(1L), None, "rnulltime")).toDF("rk", "rt", "r_tag")
    val out = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("l_tag", "r_tag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set("ok" -> "match"))
  }

  test("multi-column key as-of joins on the full key tuple") {
    import spark.implicits._
    val l = Seq((1L, "x", 10L, "lx"), (1L, "y", 10L, "ly")).toDF("k1", "k2", "t", "l_tag")
    val r = Seq((1L, "x", 9L, "rx"), (1L, "y", 8L, "ry"), (1L, "z", 1L, "rz"))
      .toDF("rk1", "rk2", "rt", "r_tag")
    val out = AsOf.join(l, r, Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt")
      .select("l_tag", "r_tag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set("lx" -> "rx", "ly" -> "ry"))
  }

  test("native exec agrees row-for-row with the union+window formulation on the fixture") {
    val window = SparkEntry.queries("join_asof")(spark, sf)
    val native = SparkEntry.queries("join_asof_native")(spark, sf)
    assert(window.exceptAll(native).isEmpty && native.exceptAll(window).isEmpty,
      "the two as-of formulations must produce the identical row multiset")
  }

  test("empty right side yields an empty (not failing) inner as-of result") {
    val out = AsOf.join(leftDf, rightDf.filter(lit(false)), Seq("k"), Seq("rk"), "t", "rt")
    assert(out.count() === 0)
  }
}
