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

  test("forward direction takes the first right row at-or-after, inclusive") {
    val out = AsOf.join(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt",
        direction = "forward")
      .select("l_tag", "r_tag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // l-a (t=10) -> r-a (rt=10, inclusive); l-b (t=5) -> r-a (rt=10);
    // l-c (t=100) -> r-c (rt=101); l-d (t=41) -> r-c; l-e: no key-3 rows
    assert(out === Set("l-a" -> "r-a", "l-b" -> "r-a", "l-c" -> "r-c", "l-d" -> "r-c"))
  }

  test("nearest direction picks the closer side and ties go backward") {
    import spark.implicits._
    val l = Seq((1L, 10L, "mid"), (1L, 4L, "below"), (1L, 39L, "tie")).toDF("k", "t", "l_tag")
    val r = Seq((1L, 8L, "r8"), (1L, 70L, "r70")).toDF("rk", "rt", "r_tag")
    val out = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt", direction = "nearest")
      .select("l_tag", "r_tag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // mid: |10-8|=2 < |70-10|=60 -> r8; below: only forward gap 4 vs back 8-4=... back
    //   exists (8>4? no: 8 > 4 so 8 is forward!) below(t=4): back none, fwd r8;
    // tie(t=39): |39-8|=31 == |70-39|=31 -> backward r8
    assert(out === Set("mid" -> "r8", "below" -> "r8", "tie" -> "r8"))
  }

  test("tolerance bounds the backward gap and drops stale matches") {
    import spark.implicits._
    val l = Seq((1L, 100L, "fresh"), (1L, 500L, "stale")).toDF("k", "t", "l_tag")
    val r = Seq((1L, 95L, "r95")).toDF("rk", "rt", "r_tag")
    val out = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt",
        tolerance = Some(10L))
      .select("l_tag", "r_tag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set("fresh" -> "r95"), "gap 405 must be dropped by tolerance 10")
  }

  test("every native direction agrees with its window-formulation twin on the fixture") {
    for ((native, twin) <- Seq(
        "join_asof_native_forward" -> "join_asof_forward",
        "join_asof_native_nearest" -> "join_asof_nearest",
        "join_asof_native_tolerance" -> "join_asof_tolerance")) {
      val n = SparkEntry.queries(native)(spark, sf)
      val w = SparkEntry.queries(twin)(spark, sf)
      assert(n.exceptAll(w).isEmpty && w.exceptAll(n).isEmpty,
        s"$native must equal $twin row-for-row")
    }
  }

  test("empty right side yields an empty (not failing) inner as-of result") {
    val out = AsOf.join(leftDf, rightDf.filter(lit(false)), Seq("k"), Seq("rk"), "t", "rt")
    assert(out.count() === 0)
  }
}
