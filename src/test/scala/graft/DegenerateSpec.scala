package graft

import org.apache.spark.sql.functions._

/** Adversarial VALUE-level degenerate cases for the eval/monitoring tier —
  * the cases [[EmptyInputSpec]]'s zero-row/all-null sweeps can't reach
  * because they need specific pathological distributions, not missing
  * data: a day with zero (or only) error events, a single-label corpus
  * where chance agreement is total (κ's 0/0), an edgeless graph. Each
  * asserts the mathematically honest OUTPUT, not just execution. */
class DegenerateSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic events table: day 1 has 10 events with ZERO errors, day 2
    * has 10 events ALL errors, day 3 has a single event (n=1 boundary). */
  private lazy val rateDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_degen_rate").toString
    val rows = (1 to 10).map(i =>
        (i.toLong, s"2024-01-01 00:0${i % 10}:00", i.toLong, "view", 1.0, "{}")) ++
      (11 to 20).map(i =>
        (i.toLong, s"2024-01-02 00:0${i % 10}:00", i.toLong, "error", 1.0, "{}")) ++
      Seq((21L, "2024-01-03 00:00:00", 21L, "error", 1.0, "{}"))
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .select($"event_id", $"ts_s".cast("timestamp").as("ts"), $"user_id",
        $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("agg_rate_ci: Wilson interval is proper at p=0, p=1, and n=1") {
    val rows = SparkEntry.queries("agg_rate_ci")(spark, rateDir)
      .orderBy("d").collect()
    assert(rows.length === 3)
    val Array(d1, d2, d3) = rows
    // p = 0: rate 0, lower bound EXACTLY 0 (Wilson, never negative), but
    // the upper bound stays OPEN — the low-volume day keeps uncertainty
    assert(d1.getAs[Long]("rate_micro") === 0L)
    assert(d1.getAs[Long]("lo_micro") === 0L)
    assert(d1.getAs[Long]("hi_micro") > 0L)
    // p = 1: mirror image
    assert(d2.getAs[Long]("rate_micro") === 1000000L)
    assert(d2.getAs[Long]("hi_micro") === 1000000L)
    assert(d2.getAs[Long]("lo_micro") < 1000000L)
    // n = 1, x = 1: interval is wide but still inside [0, 1]
    assert(d3.getAs[Long]("lo_micro") >= 0L)
    assert(d3.getAs[Long]("hi_micro") === 1000000L)
    assert(d3.getAs[Long]("hi_micro") - d3.getAs[Long]("lo_micro") > 500000L)
  }

  /** Single-label corpus: every document is confident English, so the
    * langid guess agrees with the label on every row → pe = 1 and κ is
    * the undefined 0/0 — the honest output is NULL, never NaN. */
  private lazy val kappaDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_degen_kappa").toString
    (1 to 20).map(i => (i.toLong, "the a of and to in is on the of", "en", "web", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("eval_cohens_kappa: single-label total agreement yields po=pe=1, kappa NULL") {
    val r = SparkEntry.queries("eval_cohens_kappa")(spark, kappaDir).collect().head
    assert(r.getAs[Long]("n_docs") === 20L)
    assert(r.getAs[Double]("po") === 1.0)
    assert(r.getAs[Double]("pe") === 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa")), "kappa must be NULL at pe=1, not NaN")
  }

  test("graph clustering on an edgeless graph executes and reports 0 nodes") {
    val r = graft.rel.Graph.clusteringOf(
      Seq.empty[(Long, Long)].toDF("u", "v")).collect().head
    assert(r.getAs[Long]("n_nodes") === 0L)
    assert(r.getAs[Long]("n_triangles") === 0L)
  }

  /** Paired corpora: identical 30 real documents, one of them plus an
    * empty doc, a whitespace-only doc, and a single-space doc. The PMI
    * token stream must be IDENTICAL (the oracle's unnest emits nothing
    * for them; Spark's arrays_zip([], [null]) used to add a phantom
    * null-key unigram that shifted every PMI value). */
  private lazy val (pmiCleanDir, pmiDirtyDir): (String, String) = {
    val texts = (1 to 30).map(i =>
      s"alpha beta gamma delta tok$i alpha beta epsilon zeta eta")
    val clean = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "web", t.length.toLong) }
    val dirty = clean ++ Seq(
      (100L, "", "en", "web", 0L),
      (101L, "   ", "en", "web", 3L),
      (102L, " ", "en", "web", 1L))
    val d1 = java.nio.file.Files.createTempDirectory("graft_pmi_clean").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft_pmi_dirty").toString
    clean.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d1/documents.parquet")
    dirty.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    (d1, d2)
  }

  test("text_bigram_pmi: empty/whitespace-only documents leave every PMI value unchanged") {
    def rows(dir: String) =
      SparkEntry.queries("text_bigram_pmi")(spark, dir).collect()
        .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
          r.getAs[Long]("n_ab"), r.getAs[Double]("pmi"))).toSeq
    assert(rows(pmiDirtyDir) === rows(pmiCleanDir))
  }

  test("eval_quality_auc: a single-class corpus yields NULL AUC, never NaN") {
    // kappaDir: every doc is English → y = 1 for all rows → n_neg = 0
    val r = SparkEntry.queries("eval_quality_auc")(spark, kappaDir).collect().head
    assert(r.getAs[Long]("n_neg") === 0L)
    assert(r.isNullAt(r.fieldIndex("auc")), "AUC must be NULL with one class, not NaN")
  }

  test("eval_calibration_bins: a constant-score corpus lands in bin 0, never a NULL bin") {
    // kappaDir: identical text → identical chars-per-token score → mx = mn
    val rows = SparkEntry.queries("eval_calibration_bins")(spark, kappaDir).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("bin") === 0L)
    assert(rows.head.getAs[Long]("n") === 20L)
  }

  /** Dirty numerics: NaN and ±Infinity in `events.value` (sensor glitches,
    * bad parses — routine at ingest scale). The monitoring tier must (a)
    * never crash on them (cusum's micro-quantized long overflowed under
    * ANSI before the finite-domain filter), (b) compute its moments over
    * the FINITE domain so one bad value can't poison a whole type's
    * center, and (c) propagate non-finite values through the portable
    * rounding instead of collapsing them (Spark's BIGINT floor turned a
    * NaN bucket average into 0.0 — masking the dirt). */
  private lazy val nanDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_degen_nan").toString
    val rows = (0 until 200).map { i =>
      val v =
        if (i % 29 == 0) Double.NaN
        else if (i % 31 == 0) Double.PositiveInfinity
        else if (i % 37 == 0) Double.NegativeInfinity
        else (i % 100) * 10.0
      (i.toLong, f"2024-01-${i % 28 + 1}%02d ${i % 24}%02d:00:00", i.toLong % 20,
        Seq("click", "view", "purchase", "signup", "error")(i % 5), v, "{}")
    }
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .select($"event_id", $"ts_s".cast("timestamp").as("ts"), $"user_id",
        $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("monitoring tier on NaN/Inf values: no crash, finite moments, dirt visible") {
    // cusum used to throw ARITHMETIC_OVERFLOW here; now the daily series
    // is defined over finite observations
    assert(SparkEntry.queries("ts_cusum_changepoint")(spark, nanDir).count() > 0)
    // z-scores: sigma comes from finite values only, so finite outliers
    // are still detected; non-finite observations surface as outliers
    // (both engines compare NaN as greater-than, so a NaN value flags)
    // rather than vanishing or poisoning the moments
    val z = SparkEntry.queries("ts_zscore_outlier")(spark, nanDir).collect()
    assert(z.nonEmpty)
    assert(z.forall(r =>
      !r.getAs[Double]("z").isNaN || r.getAs[Double]("value").isNaN),
      "a FINITE value must never score NaN once the moments are finite")
    assert(z.exists(r => r.getAs[Double]("value").isPosInfinity),
      "an Inf observation must surface as an outlier, not vanish")
    // resample: a bucket containing NaN reports a NaN average (pround
    // passes non-finite through) — the dirt stays VISIBLE downstream
    val rs = SparkEntry.queries("ts_resample")(spark, nanDir).collect()
    assert(rs.exists(r => r.getAs[Double]("avg_value").isNaN),
      "a NaN observation must poison its own bucket average, not round to 0.0")
    // MAD: the robust center is computed over finite values only — every
    // non-finite observation scores non-finite against the FINITE center
    // and flags; finite values score finite (a NaN-poisoned med/MAD would
    // instead flag ALL 200 rows with NaN mz)
    val mad = SparkEntry.queries("ts_mad_outlier")(spark, nanDir).collect()
    val expectNonFinite =
      (0 until 200).count(i => i % 29 == 0 || i % 31 == 0 || i % 37 == 0)
    val nonFinite = mad.filter(r => !java.lang.Double.isFinite(r.getAs[Double]("value")))
    assert(nonFinite.length === expectNonFinite,
      "every non-finite observation must flag against the finite center")
    assert(nonFinite.forall(r => !java.lang.Double.isFinite(r.getAs[Double]("mz"))))
    assert(mad.filter(r => java.lang.Double.isFinite(r.getAs[Double]("value")))
      .forall(r => !r.getAs[Double]("mz").isNaN),
      "a finite value must never score a NaN modified z-score")
    assert(mad.length < 200, "the finite bulk must not flag — the center is finite")
  }

  /** Zero-norm embeddings (dead/padded vectors — common in production
    * corpora): naive cosine is 0/0 = NaN, and Spark sorts NaN ABOVE every
    * double in a DESC order, so an unguarded zero vector would top every
    * cosine top-k. The library defines cosine-with-zero as 0. */
  private lazy val zeroVecDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_degen_vec").toString
    val dim = 64
    val rows = (1 to 30).map { i =>
      (i.toLong, Array.tabulate(dim)(d => (((i * 31 + d * 7) % 13) - 6).toFloat / 6f), i % 3)
    } :+ ((99L, Array.fill(dim)(0f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("sim_topk_cosine: a zero-norm embedding scores 0, never NaN-tops the ranking") {
    val rows = SparkEntry.queries("sim_topk_cosine")(spark, zeroVecDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("cos_sim")
      assert(!c.isNaN, s"NaN cosine leaked into the top-k: $r")
    }
    // the zero vector must not win the ranking (top row is a real match)
    assert(rows.head.getAs[Long]("vec_id") !== 99L,
      "the dead embedding NaN-topped the ranking")
  }

  test("threshold similarity: a zero-norm embedding matches NOTHING in its block") {
    // Pre-guard, the dead vector's 0/0 = NaN cosine PASSED `>= tau` in
    // BOTH engines (each compares NaN greater than any double), matching
    // it against every row of its label block. The zero-vector ⇒ 0
    // convention must hold in threshold predicates, not just rankings.
    val pairs = SparkEntry.queries("sim_threshold_join")(spark, zeroVecDir).collect()
    assert(pairs.forall(r => r.getAs[Long]("a_id") != 99L && r.getAs[Long]("b_id") != 99L),
      "the dead embedding NaN-matched into the threshold join")
    assert(pairs.forall(r => !r.getAs[Double]("cos_sim").isNaN))
    // and the cosine-dedup must KEEP the zero vector (similar-to-nothing)
    val kept = SparkEntry.queries("dedup_embed_cosine")(spark, zeroVecDir)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(kept.contains(99L), "the dead embedding was NaN-deduped away")
  }

  test("mine_frequent_pairs_rel: relative cutoffs track the basket count") {
    // 100 replicated baskets {1,2}: rel item cut ceil(0.0015*100)=1,
    // pair cut ceil(0.00013*100)=1 → the pair survives with support 100
    // and lift = 100*100/(100*100) = 1
    val b100 = (1 to 100).flatMap(ok => Seq((ok.toLong, 1L), (ok.toLong, 2L)))
      .toDF("ok", "p")
    val r = graft.rel.Mining.frequentPairsRelOf(b100, 0.0015, 0.00013).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("support") === 100L)
    assert(r.head.getAs[Double]("lift") === 1.0)
    // same DISTRIBUTION replicated 100× more: cutoffs scale with nb, so
    // the output is IDENTICAL support-fractions — the scale-safety the
    // absolute form lacks (it would admit noise pairs as volume grows)
    val b10k = (1 to 10000).flatMap(ok => Seq((ok.toLong, 1L), (ok.toLong, 2L)))
      .toDF("ok", "p")
    val r2 = graft.rel.Mining.frequentPairsRelOf(b10k, 0.0015, 0.00013).collect()
    assert(r2.length === 1)
    assert(r2.head.getAs[Long]("support") === 10000L)
    assert(r2.head.getAs[Double]("lift") === 1.0)
  }

  test("relative and absolute mines agree when the cutoffs coincide") {
    // structured baskets: items 1..6; basket i of 60 contains item j iff
    // j divides i — support(j) = 60/j, co-support patterns are exact
    val b = (1 to 60).flatMap(ok =>
        (1 to 6).filter(j => ok % j == 0).map(j => (ok.toLong, j.toLong)))
      .toDF("ok", "p")
    // nb = 60: relItem 0.24 → ceil(14.4) = 15; relPair 0.09 → ceil(5.4) = 6
    // (cutoff fractions chosen OFF integer products — 0.1·60 in doubles is
    // 6.0000000000000009, which would ceil to 7 and diverge by design)
    val rel = graft.rel.Mining.frequentPairsRelOf(b, 0.24, 0.09).collect()
    val abs = graft.rel.Mining.frequentPairsOf(b, 15L, 6L).collect()
    assert(rel.map(_.toString).toSeq === abs.map(_.toString).toSeq)
    assert(rel.nonEmpty)
  }
}
