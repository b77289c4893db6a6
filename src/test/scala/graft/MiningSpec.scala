package graft

import graft.rel.Mining

/** A-Priori frequent-pair mining on basket sets with KNOWN co-occurrence
  * structure: the item-support prune must drop pairs of infrequent items
  * BEFORE pair expansion, supports must count baskets (not item rows),
  * and lift must flag positive/negative association around 1.0. */
class MiningSpec extends SparkSpec {
  import SparkSpec.session.implicits._

  private def mine(baskets: Seq[(Long, Long)], minItem: Long, minPair: Long) =
    Mining.frequentPairsOf(baskets.toDF("ok", "p"), minItem, minPair)
      .collect()
      .map(r => ((r.getAs[Long]("p1"), r.getAs[Long]("p2")),
        (r.getAs[Long]("support"), r.getAs[Double]("lift"))))
      .toMap

  test("pair support counts co-occurring baskets exactly") {
    // items 1,2 together in baskets 10,11,12; item 3 with 1 only in 10
    val b = Seq((10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L))
    val m = mine(b, 1L, 1L)
    assert(m((1L, 2L))._1 === 3L)
    assert(m((1L, 3L))._1 === 1L)
    assert(m((2L, 3L))._1 === 1L)
    assert(m.size === 3)
  }

  test("a-priori item prune removes pairs of infrequent items before expansion") {
    val b = Seq((10L, 1L), (10L, 2L), (10L, 9L),
      (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L))
    // item 9 appears in 1 basket < minItem=2 → no pair with 9 survives
    val m = mine(b, 2L, 1L)
    assert(m.keySet === Set((1L, 2L)))
  }

  test("min pair support filters rare co-occurrences") {
    val b = Seq((10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (12L, 3L))
    val m = mine(b, 1L, 2L)
    assert(m.keySet === Set((1L, 2L)))
  }

  test("lift > 1 for positively associated items, < 1 for anti-associated") {
    // 4 baskets; 1 and 2 ALWAYS together (lift = 4*2/(2*2) = 2.0);
    // 3 and 4 in disjoint basket sets except one overlap
    val b = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 3L), (12L, 4L),
      (13L, 4L))
    val m = mine(b, 1L, 1L)
    assert(m((1L, 2L))._2 === 2.0)
    // support(3,4)=1, c3=3, c4=2, n=4 → lift = 4/(6) = 0.666667
    assert(m((3L, 4L))._2 === 0.666667)
  }

  private def rules(baskets: Seq[(Long, Long)], minConf: Double) =
    Mining.assocRulesOf(baskets.toDF("ok", "p"), 1L, 1L, minConf)
      .collect()
      .map(r => ((r.getAs[Long]("antecedent"), r.getAs[Long]("consequent")),
        (r.getAs[Long]("support"), r.getAs[Double]("confidence"),
          r.getAs[Double]("lift"))))
      .toMap

  test("assoc rules: confidence is directional, lift is not") {
    // item 1 in 4 baskets, item 2 in 2, together in 2:
    // 1⇒2 conf = 2/4 = 0.5; 2⇒1 conf = 2/2 = 1.0; lift = 2*4/(4*2) = 1.0
    val b = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (13L, 1L))
    val m = rules(b, 0.0)
    assert(m((1L, 2L)) === ((2L, 0.5, 1.0)))
    assert(m((2L, 1L)) === ((2L, 1.0, 1.0)))
  }

  test("assoc rules: min-confidence drops only the weak direction") {
    val b = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (13L, 1L))
    val m = rules(b, 0.75)
    assert(m.keySet === Set((2L, 1L)))
  }

  test("duplicate (basket, item) rows do not inflate support") {
    val b = Seq((10L, 1L), (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L))
    // caller contract is distinct rows; the declared query distincts its
    // scan — replicate that here
    val m = mine(b.distinct, 1L, 1L)
    assert(m((1L, 2L))._1 === 2L)
  }
}
