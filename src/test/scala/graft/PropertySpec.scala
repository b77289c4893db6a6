package graft

import graft.functions.VecDotNative
import graft.upsert.KeepLatest
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5): dedup idempotence, union
  * cardinality laws, cosine bounds, top-K containment, gauge/bar
  * consistency (A4 vs A5). Raw ScalaCheck generators sampled with a fixed
  * seed (scalatest-plus bridge is not in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import SparkSpec.session.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-10f, 10f)).map(_.toSeq)

  test("cosine similarity is bounded in [-1,1] and reflexive (generated vectors)") {
    val vecs = samples(vecGen, 20).filter(_.exists(_ != 0f))
    val df = vecs.zip(vecs.reverse).toDF("a", "b")
    val out = df.select(
      (VecDotNative.vec_dot_native($"a", $"b") /
        (VecDotNative.vec_norm_native($"a") * VecDotNative.vec_norm_native($"b"))).as("c"),
      (VecDotNative.vec_dot_native($"a", $"a") /
        (VecDotNative.vec_norm_native($"a") * VecDotNative.vec_norm_native($"a"))).as("self"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
    }
  }

  test("vec_cosine_prenorm equals vec_cosine_native, including zero-vector pairs") {
    // the pair-join form (norms precomputed before the join) must be
    // bit-identical to the self-contained guarded cosine — same division,
    // same zero-vector => 0 convention
    val vecs = samples(vecGen, 30) :+ Seq.fill(8)(0f)
    val df = vecs.zip(vecs.reverse).toDF("a", "b")
      .withColumn("na", VecDotNative.vec_norm_native($"a"))
      .withColumn("nb", VecDotNative.vec_norm_native($"b"))
    val out = df.select(
      VecDotNative.vec_cosine_native($"a", $"b").as("c1"),
      VecDotNative.vec_cosine_prenorm($"a", $"b", $"na", $"nb").as("c2")).collect()
    out.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) === 0,
        s"prenorm ${r.getDouble(1)} != native ${r.getDouble(0)}")
    }
    assert(out.exists(_.getDouble(0) === 0.0), "a zero-vector pair must be present and score 0")
  }

  test("keepLatest is idempotent: dedup(dedup(x)) == dedup(x)") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(1L, 5L), Gen.chooseNum(1L, 100L)))
    samples(gen, 10).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("k", "v")
      val once = KeepLatest.keepLatest(df, Seq("k"), Seq($"v".desc, monotonically_increasing_id().desc))
      val twice = KeepLatest.keepLatest(once, Seq("k"), Seq($"v".desc, monotonically_increasing_id().desc))
      assert(once.select("k", "v").orderBy("k").collect().toSeq ===
        twice.select("k", "v").orderBy("k").collect().toSeq)
      assert(once.count() === df.select("k").distinct().count())
    }
  }

  test("union cardinality: |A union all B| = |A| + |B|; distinct <= that") {
    val e = Tables.events(spark, sf)
    val a = e.filter($"event_type" === "click").select("user_id")
    val b = e.filter($"event_type" === "view").select("user_id")
    assert(a.union(b).count() === a.count() + b.count())
    assert(a.union(b).distinct().count() <= a.count() + b.count())
  }

  test("top-K containment: top-10 is a prefix of top-20 under the same total order") {
    val base = Tables.events(spark, sf)
      .groupBy($"event_type", $"user_id").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"event_type", $"user_id")
    val t10 = base.limit(10).collect().toSeq
    val t20 = base.limit(20).collect().toSeq
    assert(t20.take(10) === t10)
  }

  // (the approx/seeded bound tests — approx distinct/percentile, seeded
  // sample, MG top-terms, rolling-HLL — live in ApproxContractSpec, the
  // one spec enumerating every oracle-exempt key with its explicit bound)

  test("star-contraction CC converges on a chain with diameter far past the old 64-round cap") {
    // A path graph 0-1-2-...-N is the worst case for plain min-label
    // propagation (N rounds to drag label 0 to the far end — the round-3
    // implementation capped at 64 and would fail loudly here). Large-star/
    // small-star contracts it in O(log² N) rounds.
    val n = 500
    val pairs = (0 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("u", "v")
    val lbl = graft.llm.Dedup.propagateMinLabels(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl.size === n + 1)
    assert(lbl.values.forall(_ == 0L), s"all labels must be the component min 0")
  }

  test("star-contraction CC labels random multi-component graphs like a reference union-find") {
    val edgeGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0L, 49L), Gen.chooseNum(0L, 49L)))
    samples(edgeGen, 5).foreach { edges0 =>
      val edges = edges0.filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // reference: driver-side union-find
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(x => x -> {
            // min of component = root after min-directed unions
            find(x)
          }).toMap
        val got = graft.llm.Dedup.propagateMinLabels(edges.toDF("u", "v"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === expected)
      }
    }
  }

  test("graph_bfs_distance: source at 0, every edge spans at most one level") {
    val d = SparkEntry.queries("graph_bfs_distance")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d("c1") === 0L, "the BFS source (customer 1) must sit at distance 0")
    assert(d.values.forall(v => v >= 0 && v <= 3), "distances bounded by the round cap")
    // BFS invariant: adjacent nodes' shortest distances differ by <= 1
    // (when both are known within the cap)
    val edges = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c"), $"o_custkey").as("u"),
        concat(lit("s"), $"l_suppkey").as("v"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    for ((u, v) <- edges if d.contains(u) && d.contains(v))
      assert(math.abs(d(u) - d(v)) <= 1, s"edge ($u,$v) spans ${d(u)} -> ${d(v)}")
  }

  test("graph_label_propagation: labels are real nodes, rounds reach consensus on the dense fixture") {
    val rows = SparkEntry.queries("graph_label_propagation")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getString(1))
    val nodes = rows.map(_._1).toSet
    // every community label is itself a node of the graph (labels start
    // as node ids and propagation only ever copies existing labels)
    assert(rows.forall { case (_, lbl) => nodes.contains(lbl) },
      "a community label must be an existing node id")
    // the trade graph is dense and connected: 4 synchronous rounds must
    // collapse it far below one-community-per-node
    val nCommunities = rows.map(_._2).distinct.length
    assert(nCommunities < nodes.size / 2,
      s"$nCommunities communities over ${nodes.size} nodes — no propagation happened")
  }

  test("sim_ann_recall_eval: hits bounded by k, recall consistent, and methods agree with their own results") {
    val eval = SparkEntry.queries("sim_ann_recall_eval")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(eval.keySet === Set("ivf", "lsh"))
    for ((m, (hits, recall)) <- eval) {
      assert(hits >= 1 && hits <= 5, s"$m hits=$hits out of [1,5]")
      assert(math.abs(recall - hits / 5.0) < 1e-9, s"$m recall != hits/5")
    }
    // cross-check one method against a direct recomputation from the
    // declared queries (the eval must not disagree with its inputs)
    val gt = SparkEntry.queries("sim_topk_cosine")(spark, sf)
      .limit(5).collect().map(_.getLong(0)).toSet
    val ivf = SparkEntry.queries("sim_ann_ivf")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(eval("ivf")._1 === ivf.count(gt.contains).toLong)
  }

  test("embed_pca_project: projection is the dot with the reported loadings (centered), up to micro quantization") {
    val loadings = SparkEntry.queries("embed_pca_power")(spark, sf)
      .collect().sortBy(_.getLong(0)).map(_.getDouble(1))
    val coords = SparkEntry.queries("embed_pca_project")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val dim = loadings.length
    val mu = (0 until dim).map(i => vecs.values.map(_(i)).sum / vecs.size)
    for ((id, v) <- vecs.take(50)) {
      val expected = (0 until dim).map(i => (v(i) - mu(i)) * loadings(i)).sum
      // both mean and vector are micro-quantized in the query, so allow
      // dim * 1e-6-scale slack on the float recomputation
      assert(math.abs(coords(id) - expected) < 5e-3,
        s"vec $id: coord ${coords(id)} vs recomputed $expected")
    }
  }

  test("dedup_lsh_candidate_eval: hits bound both sets, ratios consistent, banding finds the planted dups") {
    val r = SparkEntry.queries("dedup_lsh_candidate_eval")(spark, sf).collect().head
    val (nTrue, nCand, nHits) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nHits <= math.min(nTrue, nCand), s"hits $nHits exceed a side ($nTrue, $nCand)")
    assert(nTrue > 0, "fixture plants near-duplicates — ground truth must be non-empty")
    // both ratios are pround'ed to 6 decimals — allow the rounding width
    assert(math.abs(r.getDouble(3) - nHits.toDouble / nTrue) < 1e-6, "recall != hits/n_true")
    assert(math.abs(r.getDouble(4) - nHits.toDouble / nCand) < 1e-6, "precision != hits/n_candidates")
    // 6x2 banding at j >= 0.7 has per-pair candidate probability ~0.98 —
    // near-total recall on the planted high-similarity pairs
    assert(r.getDouble(3) >= 0.8, s"banding recall collapsed: ${r.getDouble(3)}")
  }

  test("dedup_incremental_lsh: rejects only delta docs, dup_of earlier, classes consistent") {
    val rows = SparkEntry.queries("dedup_incremental_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val maxId = Tables.documents(spark, sf).agg(max($"doc_id")).collect().head.getLong(0)
    val thr = (maxId + 1) * 4 / 5
    assert(rows.nonEmpty, "fixture plants dups straddling the split — delta rejections expected")
    for ((id, dupOf, against) <- rows) {
      assert(id >= thr, s"doc $id rejected but not in the delta (thr=$thr)")
      assert(dupOf < id, s"doc $id: earliest duplicate $dupOf is not earlier")
      assert(against === (if (dupOf < thr) "corpus" else "delta"),
        s"doc $id: against=$against inconsistent with dup_of=$dupOf")
    }
    // keep-first: the incremental decision must agree with the batch
    // keep-first dedup on the same corpus — a delta doc is rejected here
    // iff the batch dedup_minhash also drops it
    val kept = SparkEntry.queries("dedup_minhash")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    for ((id, _, _) <- rows)
      assert(!kept.contains(id), s"doc $id rejected incrementally but kept by batch dedup")
  }

  test("sim_ann_ivf_cell_stats: occupancies cover the corpus, shares sum to one") {
    val rows = SparkEntry.queries("sim_ann_ivf_cell_stats")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val corpus = Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum === corpus, "every vector must land in exactly one cell")
    assert(rows.forall(_._2 > 0), "leading-vector centroids always hold at least themselves")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, s"shares must sum to 1: ${rows.map(_._3).sum}")
  }

  test("graph_pagerank is a probability distribution and hubs outrank leaves") {
    val rows = SparkEntry.queries("graph_pagerank")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    // r1000 = rank * 1000, so the ranks must sum to ~1000 (PageRank
    // conserves total mass each round: damping redistributes, never leaks,
    // and the undirected symmetrization leaves no dangling nodes).
    val total = rows.map(_._2).sum
    assert(math.abs(total - 1000.0) < 0.5, s"mass not conserved: $total")
    assert(rows.forall(_._2 > 0), "every node keeps positive rank")
    // suppliers are hubs (hundreds of customer edges each) — their mean
    // rank must dominate the customer mean.
    val (supp, cust) = rows.partition(_._1.startsWith("s"))
    assert(supp.map(_._2).sum / supp.length > 5 * cust.map(_._2).sum / cust.length,
      "hub suppliers should far outrank leaf customers")
  }

  test("curation_pack_sequences fills every chunk to capacity without splitting docs mid-chunk") {
    val rows = SparkEntry.queries("curation_pack_sequences")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // chunk ids are nondecreasing in doc order and start at 0
    val chunks = rows.sortBy(_._1).map(_._3)
    assert(chunks.head === 0L)
    assert(chunks.zip(chunks.tail).forall { case (a, b) => b >= a })
    // concat-split invariant: the docs STARTING in chunk c carry the
    // stream from offset c*2048 up to at most (c+1)*2048 + (max doc) — so
    // per-chunk token mass is bounded by capacity + the largest document.
    val maxDoc = rows.map(_._2).max
    val perChunk = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    for ((c, tok) <- perChunk if c < chunks.max) // last chunk may be short
      assert(tok <= 2048 + maxDoc, s"chunk $c overfilled: $tok")
  }

  test("curation_dsir weights discriminate: target-language docs score highest on average") {
    // the DSIR property that makes the weight useful: documents from the
    // target slice (en) must carry a higher mean per-gram log-likelihood
    // ratio than every other language's documents
    val w = SparkEntry.queries("curation_dsir")(spark, sf)
    val byLang = w.join(Tables.documents(spark, sf), "doc_id")
      .groupBy($"lang")
      .agg(avg($"log_w_micro".cast("double") / $"n_grams").as("mean_pg"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val en = byLang("en")
    for ((lang, m) <- byLang if lang != "en")
      assert(en > m, s"en mean per-gram weight $en must exceed $lang's $m")
  }

  test("gauge/bar invariant: global sum equals the sum over per-group sums (A4 vs A5)") {
    val global = SparkEntry.queries("agg_global_sum")(spark, sf)
      .head.getLong(0)
    val perGroup = SparkEntry.queries("agg_sum_by_group")(spark, sf)
      .agg(sum($"n")).head.getLong(0)
    assert(global === perGroup)
  }
}
