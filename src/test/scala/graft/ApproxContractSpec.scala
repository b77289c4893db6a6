package graft

import org.apache.spark.sql.functions._

/** THE contract spec for every oracle-exempt query — the 9 declared keys
  * whose outputs are approximate/seeded BY DESIGN and therefore carry no
  * DuckDB oracle row in CORRECTNESS_r*.json (the driver records a weaker
  * rows-only check). Exemption is not exemption from verification: each
  * test here states the MATHEMATICAL bound the sketch guarantees and
  * asserts it against the exact twin computed in the same session, so the
  * exempt surface is self-documenting — one test per exempt key, bound in
  * the test name, derivation in the comment.
  *
  * The 8 exempt keys (and their bounds):
  *   1. agg_approx_distinct      — HLL++ relative error ≤ 5% (rsd default)
  *   2. agg_approx_quantile      — ε-approximate rank, 2% value proxy
  *   3. agg_count_min            — CMS one-sided: exact ≤ est ≤ exact+εN
  *   4. agg_hll_sketch           — datasketches HLL ±5% per group
  *   5. filter_bloom             — zero false negatives; fp ≈ configured 1%
  *   6. scan_sample              — seeded Bernoulli: deterministic + Chernoff size
  *   7. text_top_terms_approx    — Misra-Gries candidate SUPERSET ⇒ exact equality
  *   8. ts_rolling_distinct_approx — HLL per window, max(2, 5%·exact)
  *   9. dq_profile_approx        — HLL ±5% per column; all non-distinct
  *                                 cells EXACTLY equal the exact twin
  */
class ApproxContractSpec extends SparkSpec {
  import SparkSpec.session.implicits._

  /** HLL++ (Heule et al. 2013): with m = 2^p registers the estimator's
    * relative standard deviation is ≈ 1.04/√m; Spark's default
    * `approx_count_distinct` rsd is 0.05, so a 1σ band is 5% — the
    * documented accuracy contract we assert directly against the exact
    * COUNT(DISTINCT) twin (`agg_count_distinct`, itself oracle-green). */
  test("agg_approx_distinct: HLL++ estimate within 5% (1 rsd) of exact per group") {
    val exact = SparkEntry.queries("agg_count_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    SparkEntry.queries("agg_approx_distinct")(spark, sf).collect().foreach { r =>
      val (flag, approx) = (r.getString(0), r.getLong(1))
      val e = exact(flag).toDouble
      assert(math.abs(approx - e) / e <= 0.05, s"$flag: approx=$approx exact=$e")
    }
  }

  /** Greenwald-Khanna / KLL contract: `approx_percentile(x, q, acc)`
    * returns a value whose RANK is within ε·n of ⌈q·n⌉, ε = 1/acc. On the
    * fixture's smooth value distribution an ε-rank error maps to a small
    * value error, asserted here as a 2% value band against the exact
    * `percentile_cont` twin (`agg_percentile`, oracle-green) — the value
    * proxy is deliberately looser than the rank bound it witnesses. */
  test("agg_approx_quantile: epsilon-rank contract, asserted as 2% value proxy vs exact") {
    val exact = SparkEntry.queries("agg_percentile")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    SparkEntry.queries("agg_approx_quantile")(spark, sf).collect().foreach { r =>
      val (st, approx) = (r.getString(0), r.getDouble(1))
      val e = exact(st)
      assert(math.abs(approx - e) / e <= 0.02, s"$st: approx=$approx exact=$e")
    }
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005): every estimate is
    * an OVERCOUNT (hash collisions only ever add), and with width
    * ⌈e/ε⌉ the excess is ≤ ε·N with probability 1−δ per probe. The
    * query builds its sketch at ε = 0.001, so: exact ≤ est ≤ exact
    * + ⌈0.001·N⌉ (+1 slack for the ceiling's own quantization). */
  test("agg_count_min: one-sided CMS bound — exact <= estimate <= exact + eps*N") {
    val est = SparkEntry.queries("agg_count_min")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    assert(est.keySet === exact.keySet)
    for ((t, e) <- est; ex = exact(t)) {
      assert(e >= ex, s"$t: CMS must never underestimate ($e < $ex)")
      assert(e <= ex + math.ceil(0.001 * total).toLong + 1,
        s"$t: estimate $e blew the eps*N bound over exact $ex")
    }
  }

  /** Apache DataSketches HLL at lgK = 14: relative standard error
    * ≈ 1.04/√2¹⁴ ≈ 0.8%; 5% is a ≳6σ band — failures indicate a broken
    * sketch, not an unlucky draw. Asserted per event_type group against
    * the exact COUNT(DISTINCT). */
  test("agg_hll_sketch: estimate within 5% (>=6 sigma at lgK=14) of exact per group") {
    val est = SparkEntry.queries("agg_hll_sketch")(spark, sf)
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").cast("double").as("exact"))
    val bad = est.join(exact, "event_type")
      .filter(abs($"approx_users" - $"exact") / $"exact" > 0.05)
    assert(bad.count() === 0)
  }

  /** Bloom filter contract: membership tests have ZERO false negatives
    * (every inserted key hits — structural, not probabilistic), and the
    * false-positive rate among true non-members concentrates near the
    * configured 1% (asserted within 5× to keep the test seed-robust on
    * small probe sets). */
  test("filter_bloom: zero false negatives; fp-rate within 5x of configured 1%") {
    val row = SparkEntry.queries("filter_bloom")(spark, sf).head()
    val nProbed = row.getAs[Long]("n_probed")
    val nHits = row.getAs[Long]("n_hits")
    val nTrue = row.getAs[Long]("n_true_members")
    val nFp = row.getAs[Long]("n_false_pos")
    assert(nHits === nTrue + nFp) // hits decompose exactly
    assert(nHits >= nTrue)        // no false negatives, ever
    val nonMembers = nProbed - nTrue
    if (nonMembers > 1000)
      assert(nFp.toDouble / nonMembers < 0.05)
  }

  /** Seeded Bernoulli sampling (`sample(fraction = 0.2, seed = 42)`):
    * (a) DETERMINISM — the same seed over the same input partitioning
    * yields the identical row set, run to run (the property that makes a
    * seeded sample reproducible at 100 TB); (b) SIZE — |S| ~
    * Binomial(n, 0.2), so by Chernoff the observed fraction stays within
    * [0.1, 0.3] except with probability < 2·exp(−n/60) — astronomically
    * small at every fixture size. */
  test("scan_sample: seeded sample is deterministic; size obeys Chernoff concentration") {
    val a = SparkEntry.queries("scan_sample")(spark, sf).collect().map(_.getLong(0)).toSeq
    val b = SparkEntry.queries("scan_sample")(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(a === b)
    val total = Tables.documents(spark, sf).count()
    assert(a.length > total * 0.1 && a.length < total * 0.3)
  }

  /** Misra-Gries (1982) with k = 256 summaries per language: the
    * candidate set provably contains EVERY term with count > n_lang/256
    * (deletion happens only in groups of k distinct terms, so a heavy
    * hitter can never be fully decremented away — the candidate-superset
    * guarantee). The query then recounts candidates EXACTLY, so for top
    * terms well above the n/k line the approx twin must equal
    * `text_top_terms` cell for cell — equality, not a band. */
  test("text_top_terms_approx: MG candidate superset + exact recount = exact equality") {
    val exact = SparkEntry.queries("text_top_terms")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val approx = SparkEntry.queries("text_top_terms_approx")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(approx === exact)
  }

  /** Rolling 7-day distinct users via per-window HLL++ (rsd 5%): each
    * window's estimate carries the HLL band of test #1 — asserted as
    * max(2, 5%·exact) so the integer floor at tiny windows (exact WAU in
    * single digits at sf0.001) doesn't turn 1-count quantization into a
    * spurious relative-error failure. */
  test("ts_rolling_distinct_approx: per-window HLL within max(2, 5% of exact WAU)") {
    val exact = SparkEntry.queries("ts_rolling_distinct")(spark, sf)
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("ts_rolling_distinct_approx")(spark, sf)
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    for ((d, a) <- approx; ex = exact(d))
      assert(math.abs(a - ex) <= math.max(2L, (ex * 0.05).toLong),
        s"day $d: approx $a vs exact $ex")
  }

  /** The at-scale profile twin: `dq_profile_approx` replaces each exact
    * count(DISTINCT) with HLL++ at rsd 0.02 (so the asserted 5% band is
    * 2.5σ — a ~99% interval, robust for a deterministic-hash sketch) and
    * changes NOTHING else — so per column the distinct estimate must sit
    * within max(2, 5%·exact) of `dq_profile`'s (itself oracle-green), and
    * every other cell (null counts, min/max) must be cell-for-cell EQUAL:
    * the sketch swap may only touch the column it sketches. */
  test("dq_profile_approx: HLL distinct within max(2, 5% of exact) per column; all other cells exact") {
    val exact = SparkEntry.queries("dq_profile")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = SparkEntry.queries("dq_profile_approx")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet === exact.keySet)
    for ((c, a) <- approx; ex = exact(c)) {
      val (ad, ed) = (a.getLong(2), ex.getLong(2))
      assert(math.abs(ad - ed) <= math.max(2L, (ed * 0.05).toLong),
        s"col $c: approx distinct $ad vs exact $ed")
      // every non-sketched cell identical (positions: col, n_null,
      // n_distinct, min_num, max_num, min_str, max_str)
      for (i <- Seq(1, 3, 4, 5, 6))
        assert(a.get(i) == ex.get(i), s"col $c field $i: ${a.get(i)} vs ${ex.get(i)}")
    }
  }
}
