package graft

/** Partition-count invariance: a declared query's RESULT must be
  * identical under a different `spark.sql.shuffle.partitions` — the
  * at-scale determinism trap this locks out is a non-total ORDER BY /
  * rank qualifier whose ties break by partition layout (fine at 4
  * partitions locally, silently reshuffled answers at 200 on a cluster).
  * Exercises the families most at risk: top-k limits, the two-phase
  * distributed rank ([[graft.rel.ScalableRank]] — its per-partition
  * row_number + broadcast offsets MUST compose to the same global rank
  * under any range partitioning), hash-based sampling, seeded LSH, and
  * grouped top-N.
  */
class DeterminismSpec extends SparkSpec {

  private val keys = Seq(
    "topk_orderby_limit", "win_rank_topn", "win_ntile", "text_top_terms",
    "topk_other_bucket", "sample_stratified_hash", "dedup_minhash",
    "sim_topk_cosine", "agg_daily_top_titles", "text_vocab_coverage",
    "mine_frequent_pairs_rel", "eval_quality_auc",
    // round-8 regression gates: join_broadcast's ORDER BY was not total
    // (ties broke by partition layout until all output columns joined the
    // sort); tpch_q9's profit sum is the exact-integer rebuild
    "join_broadcast", "tpch_q9")

  /** Sessions share one CacheManager: a subtree pinned (Materialize.once)
    * during the base run would be SERVED FROM CACHE in the alt run,
    * making the variation vacuous for everything below the pin — drop
    * all cached plans and pinned blocks between runs so the alt session
    * re-executes the full plan under its own conf. */
  private def uncacheAll(): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  private def compareUnder(conf: (String, String)): Seq[String] = {
    val alt = spark.newSession()
    alt.conf.set(conf._1, conf._2)
    keys.flatMap { k =>
      uncacheAll()
      val base = SparkEntry.queries(k)(spark, sf).collect().map(_.toString).toSeq
      uncacheAll()
      val other = SparkEntry.queries(k)(alt, sf).collect().map(_.toString).toSeq
      if (base == other) None
      else Some(s"$k: ${base.size} vs ${other.size} rows, first diff at " +
        base.zip(other).indexWhere { case (a, b) => a != b })
    }
  }

  test("declared results are invariant under a different shuffle partition count") {
    val diffs = compareUnder("spark.sql.shuffle.partitions" -> "7")
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }

  test("declared results are invariant with adaptive execution disabled") {
    // AQE rewrites shuffles/joins at runtime; results must not depend on
    // whether it ran (coalesced partitions change tie-visit order)
    val diffs = compareUnder("spark.sql.adaptive.enabled" -> "false")
    assert(diffs.isEmpty, s"AQE-sensitive results:\n${diffs.mkString("\n")}")
  }
}
