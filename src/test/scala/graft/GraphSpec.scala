package graft

import graft.rel.Graph

/** Triangle counting on graphs with KNOWN triangle structure — the
  * fixture's co-supply graph is complete (count self-validates as
  * C(100,3)), so these cases pin the algorithm on sparse/irregular
  * shapes where the degree orientation actually has work to do:
  * wedge pivots must sit at low-degree nodes and every triangle must be
  * counted exactly once regardless of edge orientation. */
class GraphSpec extends SparkSpec {
  import SparkSpec.session.implicits._

  private def count(edges: Seq[(Long, Long)]): Long = {
    val df = edges.toDF("u", "v")
    val row = Graph.trianglesOf(df).collect().head
    row.getAs[Long]("n_triangles")
  }

  test("path graph has zero triangles") {
    assert(count(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))) === 0L)
  }

  test("4-cycle with one chord has exactly two triangles") {
    // 0-1-2-3-0 plus chord 0-2 → triangles (0,1,2) and (0,2,3)
    assert(count(Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (0L, 2L))) === 2L)
  }

  test("K5 has C(5,3) = 10 triangles") {
    val k5 = for { i <- 0L until 5L; j <- (i + 1) until 5L } yield (i, j)
    assert(count(k5) === 10L)
  }

  test("star graph (max-degree hub) has zero triangles — orientation handles the hub") {
    val star = (1L to 20L).map(i => (0L, i))
    assert(count(star) === 0L)
  }

  test("disjoint triangle + dangling edge counts one") {
    assert(count(Seq((0L, 1L), (1L, 2L), (0L, 2L), (5L, 6L))) === 1L)
  }

  test("graph_link_predict: focus-bounded pairs, exact common/Jaccard vs brute force") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("graph_link_predict")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.nonEmpty && out.size <= 50 * 49 / 2, "pair space must be focus-bounded")
    // brute-force ground truth over the same bipartite graph
    val adj = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey", $"l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val focus = adj.toSeq.map { case (c, ns) => (c, ns.size) }
      .sortBy { case (c, d) => (-d, c) }.take(50).map(_._1).toSet
    for (((c1, c2), (common, jac)) <- out) {
      assert(c1 < c2 && focus(c1) && focus(c2), s"pair ($c1,$c2) outside focus")
      val inter = (adj(c1) & adj(c2)).size.toLong
      val union = (adj(c1) | adj(c2)).size.toLong
      assert(common === inter, s"($c1,$c2) common")
      assert(math.abs(jac - inter.toDouble / union) < 1e-6, s"($c1,$c2) jaccard")
    }
    // completeness: every focus pair with a shared supplier is reported
    val expected = focus.toSeq.sorted.combinations(2)
      .count { case Seq(a, b) => (adj(a) & adj(b)).nonEmpty }
    assert(out.size === expected, "missing focus pairs with shared suppliers")
  }

  private def core(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
      .toDF("src", "dst")
    Graph.kcoreOf(sym, k, rounds).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
  }

  test("k-core peel cascades: tail chain peels link by link, triangle survives") {
    // triangle 0-1-2 with a chain 2-3-4-5 hanging off it; k=2:
    // round 1 removes 5, round 2 removes 4, round 3 removes 3 —
    // the cascade needs MULTIPLE rounds, and the triangle is the 2-core.
    val g = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val out = core(g, 2, 4)
    assert(out === Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  test("k-core can peel everything (path graph has no 2-core)") {
    val out = core(Seq((0L, 1L), (1L, 2L), (2L, 3L)), 2, 4)
    assert(out.isEmpty)
  }

  test("k-core loop releases each round's pin (Materialize.pin handle contract)") {
    // Round-15 advice: a discarded pin handle kept every round's full edge
    // list persisted for the life of the query. The loop must hold at most
    // the CURRENT round's pin once its successor is materialized — after
    // the 4-round peel only the final round's RDD may remain pinned.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val g = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val sym = g.flatMap { case (u, v) => Seq((u, v), (v, u)) }.toDF("src", "dst")
    val out = Graph.kcoreOf(sym, 2, 4)
    out.collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"expected at most the final round's pin to survive, found ${leaked.size}")
    spark.sparkContext.getPersistentRDDs
      .filterKeys(leaked.contains).values.foreach(_.unpersist(blocking = false))
  }

  test("graph_kcore on the fixture converges: every survivor has core degree >= k") {
    val rows = SparkEntry.queries("graph_kcore")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("core_deg") >= 8L,
        s"${r.getAs[String]("node")} below k in the reported core")
    }
  }

  private def clustering(edges: Seq[(Long, Long)]): (Double, Double) = {
    val row = Graph.clusteringOf(edges.toDF("u", "v")).collect().head
    (row.getAs[Double]("transitivity"), row.getAs[Double]("avg_local_cc"))
  }

  test("K5 clustering: transitivity 1, every local coefficient 1") {
    val k5 = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(clustering(k5) === ((1.0, 1.0)))
  }

  test("path graph clustering is zero on both summaries") {
    assert(clustering(Seq((0L, 1L), (1L, 2L), (2L, 3L))) === ((0.0, 0.0)))
  }

  test("4-cycle with chord: transitivity 6/8, avg local = (2/3+1+2/3+1)/4") {
    // degrees: 0→3, 1→2, 2→3, 3→2; triangles (0,1,2), (0,2,3);
    // wedges Σ C(d,2) = 3+1+3+1 = 8; local cc: 2·2/6 = 2/3, 1, 2/3, 1.
    val (t, l) = clustering(Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (0L, 2L)))
    assert(t === 0.75)
    assert(math.abs(l - (2.0 / 3 + 1 + 2.0 / 3 + 1) / 4) < 2e-6)
  }

  test("star graph: hub closes nothing — transitivity 0, only the hub is degree-eligible") {
    val (t, l) = clustering(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    assert(t === 0.0 && l === 0.0)
  }
}
