package graft

import org.apache.spark.sql.functions._

/** Join edge cases: empty sides, null keys, duplicate keys — the seams
  * where outer/semi/anti semantics differ between engines.
  */
class JoinEdgeSpec extends SparkSpec {
  import SparkSpec.session.implicits._

  private lazy val left = Seq(
    (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "lv")
  private lazy val dupRight = Seq(
    (1L, "x"), (1L, "y"), (9L, "z")).toDF("k", "rv")
  private lazy val emptyRight = dupRight.filter($"k" === -1L)

  test("left join against an EMPTY right keeps all left rows, nulls padded") {
    val out = left.join(emptyRight, Seq("k"), "left_outer").orderBy($"k")
    assert(out.count() === 3)
    assert(out.select($"rv").collect().forall(_.isNullAt(0)))
  }

  test("anti join against an EMPTY right returns everything; semi returns nothing") {
    assert(left.join(emptyRight, Seq("k"), "left_anti").count() === 3)
    assert(left.join(emptyRight, Seq("k"), "left_semi").count() === 0)
  }

  test("duplicate join keys multiply inner-join rows but not semi/anti") {
    assert(left.join(dupRight, Seq("k")).count() === 2)          // 1x(x,y)
    assert(left.join(dupRight, Seq("k"), "left_semi").count() === 1)
    assert(left.join(dupRight, Seq("k"), "left_anti").count() === 2)
  }

  test("null keys never match in equi-joins (SQL three-valued logic)") {
    val withNull = Seq((Some(1L), "a"), (None, "n")).toDF("k", "lv")
    val right = Seq((Some(1L), "x"), (None, "y")).toDF("k", "rv")
    val inner = withNull.join(right, withNull("k") === right("k"))
    assert(inner.count() === 1)  // only k=1; null==null is not true
    // null-SAFE equality does match nulls
    val nsafe = withNull.join(right, withNull("k") <=> right("k"))
    assert(nsafe.count() === 2)
  }

  test("as-of join: purchase exactly AT the signup instant is inclusive") {
    // the win_session/join_asof ordering puts signup before purchase at
    // equal ts — verify the library query's inclusivity on crafted rows
    val dir = java.nio.file.Files.createTempDirectory("graft_asof").toString
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    Seq(
      (1L, ts0, 7L, "signup", 0.0, "{}"),
      (2L, ts0, 7L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", $"ts".cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    for (t <- Seq("documents", "embeddings", "lineitem", "orders", "customer",
                  "supplier", "part", "nation", "region"))
      Tables.table(spark, sf, t).limit(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    val out = SparkEntry.queries("join_asof")(spark, dir).collect()
    assert(out.length === 1, "purchase at the signup instant must match")
    assert(out.head.getLong(0) === 2L)
    // the forward and nearest variants are equally inclusive at the instant
    for (q <- Seq("join_asof_forward", "join_asof_nearest")) {
      val o = SparkEntry.queries(q)(spark, dir).collect()
      assert(o.length === 1 &&
        o.head.getAs[java.time.LocalDateTime](2) === ts0.toLocalDateTime, q)
    }
  }

  test("nearest as-of dominates both directional variants per purchase") {
    def epoch(ldt: java.time.LocalDateTime): Long =
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
    def byId(q: String) = SparkEntry.queries(q)(spark, sf).collect()
      .map(r => r.getLong(0) -> epoch(r.getAs[java.time.LocalDateTime](2))).toMap
    val purchases = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"ts").collect()
      .map(r => r.getLong(0) -> epoch(r.getAs[java.time.LocalDateTime](1))).toMap
    val back = byId("join_asof"); val fwd = byId("join_asof_forward")
    val near = byId("join_asof_nearest")
    // every directional match implies a nearest match, and the nearest
    // distance is <= both directional distances
    assert((back.keySet ++ fwd.keySet) === near.keySet)
    for ((id, nts) <- near) {
      val d = math.abs(purchases(id) - nts)
      for (b <- back.get(id)) assert(d <= math.abs(purchases(id) - b), s"back $id")
      for (f <- fwd.get(id)) assert(d <= math.abs(f - purchases(id)), s"fwd $id")
    }
  }
}
