package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Properties of the LLM-pipeline operators (SURVEY.md §5: dedup
  * idempotence, cosine bounds, top-K containment, ANN recall).
  */
class LlmSpec extends SparkSpec {
  import SparkSpec.session.implicits._

  test("dedup_exact_id is idempotent and halves the doubled stream") {
    val q = SparkEntry.queries("dedup_exact_id")
    val once = q(spark, sf)
    val n = Tables.events(spark, sf).count()
    assert(once.count() === n)
    assert(once.select("event_id").distinct().count() === n)
  }

  test("dedup_minhash catches planted exact duplicates, survivors are a subset") {
    val docs = Tables.documents(spark, sf)
    val survivors = SparkEntry.queries("dedup_minhash")(spark, sf)
    assert(survivors.count() <= docs.count())
    // plant: duplicate text under new ids must NOT both survive
    val dup = docs.limit(5)
      .withColumn("doc_id", $"doc_id" + lit(1000000L))
    val planted = docs.unionByName(dup)
    val dir = java.nio.file.Files.createTempDirectory("graft_dup").toString
    planted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for (t <- Seq("events", "embeddings"))
      Tables.table(spark, sf, t).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    val after = SparkEntry.queries("dedup_minhash")(spark, dir)
    // every planted clone pairs with its identical original (lower id) -> dropped
    assert(after.filter($"doc_id" >= 1000000L).count() === 0)
    // and the original corpus dedups identically with or without the clones
    assert(after.count() === survivors.count())
  }

  test("native MinHash and mllib MinHashLSH broadly agree (same corpus, same threshold)") {
    val native = SparkEntry.queries("dedup_minhash")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val mllib = llm.Dedup.minhashMllibSurvivors(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val total = Tables.documents(spark, sf).count()
    // both are probabilistic candidate generators with ~98% recall at the
    // threshold; allow a small symmetric difference, not exact equality
    val symDiff = (native -- mllib) ++ (mllib -- native)
    assert(symDiff.size <= math.max(2L, total / 50).toInt,
      s"native=${native.size} mllib=${mllib.size} symDiff=${symDiff.size}")
  }

  test("simhash: identical text => identical signature; near text => close") {
    val sig = SparkEntry.queries("dedup_simhash")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byText = texts.groupBy(_._2).values.filter(_.size > 1)
    byText.foreach { grp =>
      val sigs = grp.keys.map(sig).toSet
      assert(sigs.size === 1, "same text must hash to same simhash")
    }
  }

  test("simhash hamming join: pairs within bound, exact dups at distance 0, blocking is lossless") {
    val pairs = SparkEntry.queries("dedup_simhash_hamming")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.forall(_._3 <= 3), "verify bound")
    val sig = SparkEntry.queries("dedup_simhash")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the multi-index block join must find EVERY pair at distance <= 3
    // (pigeonhole guarantee) — brute-force the small fixture to prove it
    val ids = sig.keys.toSeq.sorted
    val brute = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      d = java.lang.Long.bitCount(sig(ids(i)) ^ sig(ids(j)))
      if d <= 3
    } yield (ids(i), ids(j), d.toLong)
    assert(pairs.toSet === brute.toSet, "blocked join must equal brute force")
    // identical text => identical signature => hamming 0 pair present
    val texts = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (grp <- texts.groupBy(_._2).values.filter(_.size > 1);
         a <- grp.keys.toSeq.sorted.take(1); b <- grp.keys.toSeq.sorted.drop(1).take(1))
      assert(pairs.exists(p => p._1 === math.min(a, b) && p._2 === math.max(a, b) && p._3 === 0L),
        s"exact dup pair ($a,$b) missing")
  }

  test("simhash wide (120-bit): blocked join equals an independent brute force") {
    val pairs = SparkEntry.queries("dedup_simhash_wide")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.forall(_._3 <= 3), "verify bound")
    // independent 120-bit signature computation — plain Scala from first
    // principles (MessageDigest md5, same disjoint hex halves), so the
    // proof does not share a single line with the pipeline under test
    def sig(text: String): (Long, Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val t1 = Array.fill(60)(0); val t2 = Array.fill(60)(0)
      for (w <- text.trim.split(" ", -1)) {
        val h = md.digest(w.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        val h1 = java.lang.Long.parseLong(h.substring(0, 15), 16)
        val h2 = java.lang.Long.parseLong(h.substring(16, 31), 16)
        for (i <- 0 until 60) {
          if (((h1 >> i) & 1) == 1) t1(i) += 1 else t1(i) -= 1
          if (((h2 >> i) & 1) == 1) t2(i) += 1 else t2(i) -= 1
        }
      }
      def asm(t: Array[Int]) = (0 until 60).map(i => if (t(i) >= 0) 1L << i else 0L).sum
      (asm(t1), asm(t2))
    }
    val sigs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> sig(r.getString(1))).toMap
    val ids = sigs.keys.toSeq.sorted
    val brute = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      d = java.lang.Long.bitCount(sigs(ids(i))._1 ^ sigs(ids(j))._1) +
        java.lang.Long.bitCount(sigs(ids(i))._2 ^ sigs(ids(j))._2)
      if d <= 3
    } yield (ids(i), ids(j), d.toLong)
    assert(pairs.toSet === brute.toSet,
      "120-bit blocked join must equal the independent brute force")
  }

  test("cosine is bounded, reflexive, and symmetric on real embeddings") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val a = e.select($"vec_id".as("a_id"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("b_id"), $"embedding".as("vb"))
    val pairs = a.join(b, $"a_id" <= $"b_id")
      .withColumn("cos", vec_cosine($"va", $"vb"))
    assert(pairs.filter($"cos" > 1.0000001 || $"cos" < -1.0000001).count() === 0)
    assert(pairs.filter($"a_id" === $"b_id" && abs($"cos" - 1.0) > 1e-9).count() === 0)
  }

  test("sim_topk_cosine: top-10 is contained in top-11 and led by the query itself") {
    val top10 = SparkEntry.queries("sim_topk_cosine")(spark, sf).collect()
    assert(top10.head.getLong(0) === 0L)  // query vec is vec_id 0, cos 1.0
    assert(math.abs(top10.head.getDouble(1) - 1.0) < 1e-6)
  }

  test("sim_ann_lsh results are a subset of the brute-force ranking, query included") {
    val ann = SparkEntry.queries("sim_ann_lsh")(spark, sf).collect()
    assert(ann.nonEmpty)
    assert(ann.head.getLong(0) === 0L)
    val bruteAll = Tables.embeddings(spark, sf)
      .crossJoin(broadcast(Tables.embeddings(spark, sf).orderBy("vec_id").limit(1)
        .select($"embedding".as("qv"))))
      .withColumn("cos", vec_cosine($"embedding", $"qv"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ann.map(_.getLong(0)).toSet.subsetOf(bruteAll))
  }

  test("sim_threshold_lsh pairs are a subset of the exact all-pairs threshold join") {
    val lsh = SparkEntry.queries("sim_threshold_lsh")(spark, sf).collect()
    assert(lsh.nonEmpty)
    val e = Tables.embeddings(spark, sf)
    val exact = e.select($"vec_id".as("a_id"), $"embedding".as("va"))
      .join(e.select($"vec_id".as("b_id"), $"embedding".as("vb")), $"a_id" < $"b_id")
      .filter(vec_cosine($"va", $"vb") >= 0.35)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every LSH-found pair really is over threshold (precision = 1: the
    // exact verify runs on candidates); recall < 1 by design
    assert(lsh.map(r => (r.getLong(0), r.getLong(1))).toSet.subsetOf(exact))
    // the scale geometry (r=24) obeys the identical contract: exact
    // verify on candidates => still a subset of the true threshold set.
    // Its gate fixture plants PlantN exact-duplicate vectors (ids offset
    // far past any corpus id space) so the gate row is non-vacuous
    // (round-10 verdict task 2):
    // planted pairs must surface with cos ≈ 1; organic pairs must still
    // be a subset of the true threshold set.
    val wide = SparkEntry.queries("sim_threshold_lsh_wide")(spark, sf).collect()
    val plantOffset = 1000000000000000L
    val (plantedPairs, organic) = wide.partition(r => r.getLong(1) >= plantOffset)
    assert(organic.map(r => (r.getLong(0), r.getLong(1))).toSet.subsetOf(exact))
    assert(plantedPairs.nonEmpty, "planted duplicates must collide in every band")
    plantedPairs.foreach { r =>
      assert(r.getLong(1) - plantOffset == r.getLong(0),
        "a planted copy must pair with its own original")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-6)
    }
  }

  test("sim_ann_ivf: query's own inverted list contains it; subset of brute force") {
    val ivf = SparkEntry.queries("sim_ann_ivf")(spark, sf).collect()
    assert(ivf.nonEmpty)
    assert(ivf.head.getLong(0) === 0L)  // query (vec 0) tops its own list
    assert(math.abs(ivf.head.getDouble(1) - 1.0) < 1e-6)
    val all = Tables.embeddings(spark, sf).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ivf.map(_.getLong(0)).toSet.subsetOf(all))
  }

  test("sim_ann_pq: ordered ADC top-10, query excluded, genuinely discriminative") {
    val pq = SparkEntry.queries("sim_ann_pq")(spark, sf).collect()
    assert(pq.length === 10)
    val ids = pq.map(_.getLong(0))
    assert(!ids.contains(0L), "the query vector must be excluded")
    val adcs = pq.map(_.getLong(1))
    assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b }, "ADC must ascend")
    // the quantized ranking must beat random selection: mean TRUE distance
    // of the ADC top-10 below the corpus mean (deterministic on the fixture
    // — measured 1.61 vs 1.99; full bit-exactness is the oracle's job)
    val truth = Tables.embeddings(spark, sf)
      .crossJoin(broadcast(Tables.embeddings(spark, sf)
        .filter($"vec_id" === 0).select($"embedding".as("qv"))))
      .filter($"vec_id" =!= 0)
      .select($"vec_id", expr(
        """aggregate(zip_with(embedding, qv,
          |  (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *
          |            (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
          |  0D, (s, v) -> s + v)""".stripMargin).as("d2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val topMean = ids.map(truth).sum / ids.length
    val corpusMean = truth.values.sum / truth.size
    assert(topMean < corpusMean,
      s"PQ top-10 mean true d2 $topMean must beat the corpus mean $corpusMean")
  }

  test("multimodal decode stub: fixed feature shape and deterministic values") {
    val out = SparkEntry.queries("multimodal_decode_stub")(spark, sf)
    val rows = out.limit(10).collect()
    assert(out.columns.toSeq === Seq("doc_id", "lang", "f_len", "f_head", "f_tail", "f_checksum"))
    rows.foreach { r =>
      assert(r.getDouble(2) > 0d)  // payload length
      assert(r.getDouble(5) >= 0d && r.getDouble(5) < 256d)  // byte-sum checksum
    }
    // deterministic across runs
    val again = SparkEntry.queries("multimodal_decode_stub")(spark, sf).limit(10).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("text quality/stop-ratio stay in [0,1]") {
    val q = SparkEntry.queries("text_quality")(spark, sf)
    assert(q.filter($"quality" < 0 || $"quality" > 1).count() === 0)
    assert(q.filter($"stop_ratio" < 0 || $"stop_ratio" > 1).count() === 0)
  }

  test("embed_kmeans: every vector assigned, k clusters in use, assignment is the argmin") {
    val out = SparkEntry.queries("embed_kmeans")(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.length.toLong === n, "one assignment per vector")
    val clusters = out.map(_.getLong(1)).toSet
    assert(clusters.subsetOf((0L until 5L).toSet) && clusters.size >= 2,
      s"clusters must come from the k seeds and split the corpus: $clusters")
    out.foreach(r => assert(r.getDouble(2) >= 0d, "squared distance is non-negative"))
  }

  test("embed_outlier: full cover, standardized z, threshold consistent") {
    val out = SparkEntry.queries("embed_outlier")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
    val n = Tables.embeddings(spark, sf).count()
    assert(out.length.toLong === n, "one verdict per vector")
    out.foreach { case (id, d2, z, flag) =>
      assert(d2 >= 0d, s"vec $id distance")
      assert(flag === (z >= 2.0), s"vec $id flag/threshold mismatch")
    }
    // the z distribution is standardized: mean ~0, at most a few percent
    // of a roughly-bell-shaped population beyond 2 sigma
    val zs = out.map(_._3)
    assert(math.abs(zs.sum / zs.length) < 0.01, "z mean must be ~0")
    val fracOut = out.count(_._4).toDouble / out.length
    assert(fracOut < 0.2, s"outlier fraction $fracOut implausibly high")
  }

  test("text_contamination: benchmark docs excluded; hits bounded by gram count") {
    val out = SparkEntry.queries("text_contamination")(spark, sf).collect()
    out.foreach { r =>
      assert(r.getLong(0) % 97 != 0, "benchmark slice must not appear in the verdicts")
      assert(r.getLong(2) <= r.getLong(1), "hits cannot exceed the doc's distinct grams")
    }
  }

  test("embed_pca_power: unit-norm output that is a genuine top eigenvector") {
    val out = SparkEntry.queries("embed_pca_power")(spark, sf).collect()
      .sortBy(_.getLong(0))
    val v = out.map(_.getDouble(1))
    val lambda = out.head.getDouble(2)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-3, "loadings must be unit-norm")
    assert(lambda > 0.0)
    // recompute the covariance exactly in scala and check Cv ≈ λv: the
    // relational power iteration must agree with the mathematical object
    val x = Tables.embeddings(spark, sf).select($"embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = x.length
    val dim = v.length
    val mu = Array.tabulate(dim)(j => x.map(_(j)).sum / n)
    val cv = Array.tabulate(dim) { i =>
      (0 until dim).map { j =>
        x.map(r => (r(i) - mu(i)) * (r(j) - mu(j))).sum / n * v(j)
      }.sum
    }
    val rayleigh = (0 until dim).map(i => v(i) * cv(i)).sum
    assert(math.abs(rayleigh - lambda) / lambda < 0.02,
      s"Rayleigh quotient $rayleigh vs reported eigenvalue $lambda")
    val resid = math.sqrt((0 until dim).map(i => {
      val d = cv(i) - lambda * v(i); d * d
    }).sum)
    assert(resid / lambda < 0.1,
      s"residual ||Cv - lambda v|| / lambda = ${resid / lambda} too large")
  }

  test("sim_ann_ivf_pq: full result, monotone ADC, scores consistent with flat PQ") {
    val ivfPq = SparkEntry.queries("sim_ann_ivf_pq")(spark, sf).collect()
    assert(ivfPq.length === 10)
    val scores = ivfPq.map(_.getLong(1))
    assert(scores.sameElements(scores.sorted), "ADC distances must ascend")
    // the cell pruning must not change a vector's ADC score — any vec_id
    // in both rankings carries the identical nano distance
    val flat = SparkEntry.queries("sim_ann_pq")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val common = ivfPq.flatMap(r => flat.get(r.getLong(0)).map((_, r.getLong(1))))
    assert(common.nonEmpty, "probing 4 of 16 cells should retain top hits")
    common.foreach { case (a, b) => assert(a === b) }
  }

  test("text_segment_dedup: untouched docs reconstruct verbatim; removal is real and selective") {
    val out = SparkEntry.queries("text_segment_dedup")(spark, sf).cache()
    val joined = out.join(Tables.documents(spark, sf), "doc_id")
    // reconstruction identity: a doc that lost no segments must round-trip
    // split→chunk→join back to its exact original text
    val untouched = joined.filter($"n_kept" === $"n_segs")
    assert(untouched.count() > 0)
    assert(untouched.filter($"text_dedup" =!= $"text").count() === 0,
      "untouched docs must reconstruct verbatim")
    // non-vacuous but selective: some docs lose segments, none lose all,
    // and most of the corpus is untouched (boilerplate is the minority)
    val touched = joined.filter($"n_kept" < $"n_segs")
    assert(touched.count() > 0, "threshold must flag real boilerplate")
    assert(out.filter($"n_kept" === 0 && $"n_segs" > 0).count() === 0,
      "no document should be erased entirely")
    assert(touched.count() * 2 < out.count(), "removal must stay selective")
    out.unpersist()
  }

  test("sample_domain_mix: kept shares track the declared mix within sampling noise") {
    // f_l·n_l ≈ p_l·T by construction; with md5-uniform draws the kept
    // count per domain concentrates around it. 15% relative slack covers
    // binomial noise at fixture scale without hiding a broken fraction.
    val kept = SparkEntry.queries("sample_domain_mix")(spark, sf)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = kept.values.sum.toDouble
    val targets = Map("en" -> 0.40, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15)
    targets.foreach { case (l, p) =>
      val share = kept.getOrElse(l, 0L) / total
      assert(math.abs(share - p) <= 0.15 * p + 0.02,
        s"$l kept share $share vs target $p")
    }
  }
}
