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
}
