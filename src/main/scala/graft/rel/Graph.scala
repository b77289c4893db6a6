package graft.rel

import graft.{QueryModule, Tables}
import graft.functions.PortableRound.pround
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics as declarative join+aggregate rounds.
  *
  * PageRank is the canonical link-graph quality signal: pretraining
  * pipelines weight web documents by (variants of) it when assembling a
  * corpus, and the reference's wiki domain is exactly a page graph
  * (the reference itself stops at per-page edit counts — its top-pages
  * dashboards; this is the natural next analytics step over the same
  * entities). The fixture graph is the undirected customer–supplier trade
  * graph from `orders ⋈ lineitem` — the densest deterministic graph the
  * test tables induce.
  *
  * Scale shape (100 TB): the edge list is degree-annotated, hash-
  * partitioned on the source key, and pinned ONCE — its cached
  * partitioning satisfies the join's distribution requirement, so across
  * all rounds the edges never reshuffle. Each round then moves only the
  * small (node, rank) frame: one exchange to the source key for the join,
  * one partial+final aggregation exchange on the destination key — the
  * irreducible propagation cost of message-passing on a graph. No driver
  * collect: the node count is the only scalar and is computed once. Rounds
  * are a fixed constant (5) — unlike connected components there is no
  * data-dependent convergence loop, so the plan depth is bounded and
  * lineage stays recomputable without checkpoints. Skewed hub nodes (a
  * supplier joined by thousands of customers) are exactly the skew AQE's
  * skew-join split handles; the aggregation side is safe because partial
  * aggregation combines hub contributions map-side.
  */
object Graph extends QueryModule {

  private val Damping = 0.85
  private val Rounds = 5
  private val LpaRounds = 4

  /** LONG-encoded (customer k → 2k, supplier k → 2k+1) view of the SHARED
    * pinned trade-pair list ([[PinnedInputs.tradePairs]]) — a map over the
    * pinned ~107k rows, so the nine graph queries each start from the
    * materialized edge table instead of re-running the orders ⋈ lineitem
    * distinct build. */
  private def encodedPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    PinnedInputs.tradePairs(spark, sfDir)
      .select(($"c" * 2).as("a"), ($"s" * 2 + 1).as("b"))
  }

  /** 5-round PageRank over the undirected customer–supplier trade graph;
    * one row per node, rank reported at portable 6-decimal rounding. */
  private def pagerank(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Nodes are LONG-encoded for the hot loop (customer k → 2k,
    // supplier k → 2k+1): the 5-round join+agg hashes and compares the
    // node key ~10·|E| times, and a fixed 8-byte key beats a string
    // there; display names materialize once in the final projection.
    val pairs = encodedPairs(spark, sfDir)
    // Symmetrize, attach out-degrees, hash-partition on the join key, and
    // pin: the cached partitioning satisfies every round's join
    // requirement, so the (large) edge side never reshuffles — only the
    // small rank frame moves each round. Degrees ride along so rounds
    // never re-join a separate degree table.
    val edges = Materialize.once {
      // Symmetrize by EXPLODE, not union: a union of two projections of
      // `pairs` recomputes the join+distinct subtree once per branch; the
      // explode emits both orientations in the same pass.
      val sym = pairs
        .select(explode(array(
          struct($"a".as("src"), $"b".as("dst")),
          struct($"b".as("src"), $"a".as("dst")))).as("e"))
        .select($"e.src".as("src"), $"e.dst".as("dst"))
      // Degrees via a count-window over the repartitioned frame: the
      // window's clustering is satisfied by the repartition (no exchange)
      // and it keeps `sym` SINGLE-consumer — an aggregate+join degree
      // attach reads the un-pinned sym subtree twice. Sorting 8-byte
      // keys within partitions is cheap next to recomputing the
      // join+distinct pair build.
      sym.repartition($"src")
        .withColumn("deg", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy($"src")))
    }
    // The one scalar: |V| — attached as a 1-row BROADCAST subtree instead
    // of a driver-side count() action (guide §1.2/§5 "the driver should do
    // almost no data work"): the count was a full sequential job (edge
    // build + distinct + agg) the driver had to finish before the rank
    // chain could even be submitted; as a broadcast it rides inside the
    // one action. The long count divides identically (same IEEE double
    // ops), and `nn` is constant per group so first(nn) is deterministic.
    val nrow = edges.select($"src").distinct()
      .agg(count(lit(1)).as("nn"))
    var ranks = edges.select($"src".as("node")).distinct()
      .crossJoin(broadcast(nrow))
      .select($"node", (lit(1.0) / $"nn").as("r"), $"nn")
    for (_ <- 1 to Rounds) {
      ranks = edges
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy($"dst".as("node"))
        .agg((lit((1 - Damping)) / first($"nn") +
          lit(Damping) * sum($"r" / $"deg")).as("r"),
          first($"nn").as("nn"))
    }
    ranks.select(
        when($"node" % 2 === 0, concat(lit("c"), ($"node" / 2).cast("long")))
          .otherwise(concat(lit("s"), (($"node" - 1) / 2).cast("long")))
          .as("node"),
        pround($"r" * 1000, 6).as("r1000"))
      .orderBy($"node")
  }

  /** Triangle count over the supplier co-supply graph (edge = two
    * suppliers who stock the same order) — the clustering-coefficient
    * primitive for community/density analysis over the trade network.
    * PageRank's customer–supplier graph is bipartite (triangle-free by
    * construction), so this uses the one-mode projection instead; the
    * per-order self-join fanout is bounded by order size (≤ 7 lines), so
    * the projection is linear in the fact table.
    *
    * Scale shape (100 TB): the naive wedge join explodes on hub nodes
    * (a supplier in a million orders yields 10^12 wedges). The standard
    * fix — Schank/Wagner degree ordering, the same orientation the
    * MapReduce/Cohen formulation uses — directs every edge from its
    * (degree, id)-smaller endpoint to the larger, making every wedge
    * pivot a LOW-degree node: wedge count drops from Σ deg² to
    * O(|E|^1.5) worst-case, hub-skew-proof. Both the oriented edge list
    * and the base pairs are pinned once ([[Materialize.once]]) — three
    * consumers each, no subtree recompute. The close step is an inner
    * equi-join (oriented edges are distinct, so multiplicity is exact),
    * never a nested loop. */
  private def triangleCount(spark: SparkSession, sfDir: String): DataFrame =
    trianglesFrom(
      PinnedInputs.coSupplyPairs(spark, sfDir),
      PinnedInputs.coSupplyDeg(spark, sfDir),
      PinnedInputs.coSupplyOriented(spark, sfDir))

  /** Support-sampled co-supply projection (1-in-10 orders): the full
    * projection of this SMALL dense fixture saturates to a complete
    * graph (K1000 at sf0.1 ⇒ C(1000,3) ≈ 1.7e8 wedges — measured 312 s;
    * no orientation can fix a clique). Real co-occurrence graphs bound
    * density the same way — support thresholds or edge sampling
    * (Doulion) — BEFORE triangle counting; the deterministic key slice
    * keeps the oracle replayable. At sf0.1 this yields 107k edges /
    * 6.9M oriented wedges / 1.79M triangles — a real sparse-graph load.
    * Canonical undirected edge list: `u < v`, distinct, no self-loops.
    * Shared by [[triangleCount]] and [[clusteringCoeff]]. */
  private[graft] def coSupplyEdges(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey" % 10 === 0)
      .select($"l_orderkey".as("ok"), $"l_suppkey".as("s")).distinct()
    li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.s") < col("y.s"))
      .select(col("x.s").as("u"), col("y.s").as("v")).distinct()
  }

  /** Degree frame of a canonical undirected edge list: one partial+final
    * agg over both endpoint projections. */
  private[graft] def degOf(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select($"u".as("node"))
      .unionByName(pairs.select($"v".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("deg"))
  }

  /** Schank–Wagner degree orientation of a canonical undirected edge list:
    * each edge directed low-degree → high-degree (ties by node id), carrying
    * the head's degree for the wedge-ordering predicate. The shared
    * trajectory of the whole triangle family — built once per session via
    * [[PinnedInputs.coSupplyOriented]] for the declared queries. */
  private[graft] def orientOf(pairs: DataFrame, deg: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val withDeg = pairs
      .join(deg.select($"node".as("u"), $"deg".as("du")), "u")
      .join(deg.select($"node".as("v"), $"deg".as("dv")), "v")
    val fwd = $"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v")
    withDeg.select(
      when(fwd, $"u").otherwise($"v").as("a"),
      when(fwd, $"v").otherwise($"u").as("b"),
      when(fwd, $"dv").otherwise($"du").as("db"))
  }

  /** Degree-oriented triangle counting over a canonical undirected edge
    * list (`u < v`, distinct, no self-loops). Package-visible so tests
    * can drive it with graphs of known triangle structure. */
  private[graft] def trianglesOf(edges: DataFrame): DataFrame = {
    val pairs = Materialize.once(edges)
    val deg = degOf(pairs)
    trianglesFrom(pairs, deg, Materialize.once(orientOf(pairs, deg)))
  }

  /** Triangle count from pre-built (ideally session-pinned) inputs. */
  private def trianglesFrom(pairs: DataFrame, deg: DataFrame,
                            oriented: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.a") === col("e2.a") &&
          (col("e1.db") < col("e2.db") ||
            (col("e1.db") === col("e2.db") && col("e1.b") < col("e2.b"))))
      .select(col("e1.b").as("wb"), col("e2.b").as("wc"))
    val nTri = wedges.join(oriented,
        $"wb" === $"a" && $"wc" === $"b")
      .agg(count(lit(1)).as("n_triangles"))
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(pairs.agg(count(lit(1)).as("n_edges")))
      .crossJoin(nTri)
  }

  /** Clustering coefficients over the co-supply graph — the density
    * summary one level finer than [[triangleCount]]'s total: global
    * transitivity 3T / Σ C(d,2) ("what fraction of wedges close?") and
    * the average LOCAL coefficient 2t_v / d_v(d_v−1) (Watts–Strogatz
    * 1998 — small-world detection; a high-transitivity graph with low
    * average local CC is hub-closed, the classic supply-concentration
    * signature).
    *
    * Scale shape (100 TB): identical degree-oriented wedge machinery as
    * [[trianglesOf]] (Schank/Wagner orientation — wedge count O(|E|^1.5),
    * hub-skew-proof), but the wedge keeps its pivot so the close join
    * yields triangle NODE TRIPLES; those explode 3× and aggregate to
    * per-node counts (rows = 3T, never touching the corpus), and both
    * summaries reduce from the degree frame + the per-node counts.
    * Determinism: T, W and all degrees are exact integers; each local
    * coefficient is micro-quantized to 1e-6 units (identical one-division
    * double op both engines) and SUMMED AS INTEGERS — a float sum over
    * nodes would be partition-order-dependent. */
  private def clusteringCoeff(spark: SparkSession, sfDir: String): DataFrame =
    clusteringFrom(
      PinnedInputs.coSupplyDeg(spark, sfDir),
      PinnedInputs.coSupplyOriented(spark, sfDir))

  /** Clustering coefficients over a canonical undirected edge list
    * (`u < v`, distinct, no self-loops). Package-visible so tests can
    * drive it with graphs of known clustering structure. */
  private[graft] def clusteringOf(edges: DataFrame): DataFrame = {
    val pairs = Materialize.once(edges)
    val deg = Materialize.once(degOf(pairs))
    clusteringFrom(deg, Materialize.once(orientOf(pairs, deg)))
  }

  /** Clustering summaries from pre-built (ideally session-pinned) inputs. */
  private def clusteringFrom(deg: DataFrame, oriented: DataFrame): DataFrame = {
    val spark = deg.sparkSession
    import spark.implicits._
    // Pivot-carrying wedges: the close join emits (pivot, wb, wc) node
    // triples instead of a bare count.
    val tris = oriented.as("e1").join(oriented.as("e2"),
        col("e1.a") === col("e2.a") &&
          (col("e1.db") < col("e2.db") ||
            (col("e1.db") === col("e2.db") && col("e1.b") < col("e2.b"))))
      .select(col("e1.a").as("p"), col("e1.b").as("wb"), col("e2.b").as("wc"))
      .join(oriented, $"wb" === $"a" && $"wc" === $"b")
    // `tris` has two consumers (per-node counts + the total) and is
    // deliberately NOT pinned: both consumers are 1-row/|V|-row aggregates
    // attached by broadcast, and Spark builds independent broadcast
    // subtrees CONCURRENTLY — a pin (tried round 16, with the total
    // derived as Σt/3 from the pinned per-node counts) serialized the two
    // wedge passes behind one cache fill and measured consistently slower
    // in 4/4 interleaved A/B pairs (1.26-1.45 → 1.45-1.76 iso). On a
    // cluster the two passes share executors either way; locally the
    // overlap wins.
    val triPerNode = tris
      .select(explode(array($"p", $"wb", $"wc")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("t"))
    // Local coefficients: micro-quantize each 2t/d(d-1) to 1e-6 integer
    // units, sum exactly, divide once at the end.
    val local = deg.join(triPerNode, Seq("node"), "left")
      .filter($"deg" >= 2)
      .select(
        floor(lit(2.0) * coalesce($"t", lit(0L)) / ($"deg" * ($"deg" - 1))
          * 1e6 + 0.5).as("q"))
      .agg(sum($"q").as("qsum"), count(lit(1)).as("n_elig"))
    val wedgesTotal = deg
      .agg(count(lit(1)).as("n_nodes"),
        sum($"deg" * ($"deg" - 1)).as("w2")) // = 2·Σ C(d,2)
    val nTri = tris.agg(count(lit(1)).as("n_triangles"))
    wedgesTotal.crossJoin(nTri).crossJoin(local)
      .select($"n_nodes", $"n_triangles",
        pround(lit(6.0) * $"n_triangles" / $"w2", 6).as("transitivity"),
        pround($"qsum".cast("double") / lit(1e6) / $"n_elig", 6)
          .as("avg_local_cc"))
  }

  private val BfsRounds = 3
  private val BfsSource = 2L // customer 1 in the 2k/2k+1 long encoding

  /** Bounded-hop BFS shortest distances from one node of the trade graph
    * — the reachability/ego-network primitive next to [[pagerank]] and
    * [[triangleCount]] (lineage tracing, fraud-ring radius, "who is
    * within k hops of this supplier"). Frontier expansion as
    * join+min-aggregate rounds over the SAME long-encoded symmetrized
    * edge list as PageRank; the round count is a fixed constant, so plan
    * depth is bounded and the DuckDB recursive-CTE oracle replays the
    * identical (node, dist<=K) worklist and takes the identical min.
    *
    * Scale shape (100 TB): the edge list pins once, hash-partitioned on
    * src; each round moves only the (node, dist) frame (one join
    * exchange + one min-agg exchange — min combines map-side). Joining
    * the full known set each round (not just the newest frontier) trades
    * K small re-joins for not carrying a per-round frontier marker; at a
    * production diameter you'd keep the frontier delta exactly like the
    * connected-components loop does. */
  private def bfsDistance(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = encodedPairs(spark, sfDir)
    val edges = Materialize.once(pairs
      .select(explode(array(
        struct($"a".as("src"), $"b".as("dst")),
        struct($"b".as("src"), $"a".as("dst")))).as("e"))
      .select($"e.src".as("src"), $"e.dst".as("dst")))
    var dists = Seq((BfsSource, 0L)).toDF("node", "dist")
    var handle: org.apache.spark.rdd.RDD[_] = null
    for (_ <- 1 to BfsRounds) {
      // Re-root each round's (node, dist) frame ([[Materialize.pin]]):
      // the round references its input TWICE (the union branch + the
      // expansion join), so an un-pinned chain embeds round r−1's plan 2×
      // — 2^rounds plan copies AND 2^rounds runtime recomputes of every
      // small join/agg (nothing cached the frame). Pinned, each round
      // computes once and re-analyzes a leaf; rows are identical.
      // Pin-handle contract (round-15 advice): materialize eagerly and
      // release round r−1's blocks — only the last round stays pinned.
      val (next, nextHandle) = Materialize.pin(dists.union(
          dists.withColumnRenamed("node", "src")
            .join(edges, Seq("src"))
            .select($"dst".as("node"), ($"dist" + 1).as("dist")))
        .groupBy($"node").agg(min($"dist").as("dist")))
      nextHandle.count()
      if (handle != null) handle.unpersist(blocking = false)
      dists = next
      handle = nextHandle
    }
    dists.select(
        when($"node" % 2 === 0, concat(lit("c"), ($"node" / 2).cast("long")))
          .otherwise(concat(lit("s"), (($"node" - 1) / 2).cast("long")))
          .as("node"),
        $"dist")
      .orderBy($"node")
  }

  /** Synchronous label propagation (community detection) over the
    * undirected trade graph — the cheap communities-first pass (Raghavan
    * et al. 2007) a corpus pipeline runs to group related entities
    * before sampling or dedup decisions, completing the graph family
    * next to [[pagerank]] (importance), [[triangleCount]] (density),
    * [[bfsDistance]] (reachability) and [[degreeHist]] (skew).
    *
    * Determinism (LPA is notoriously order-dependent; this variant is
    * not): SYNCHRONOUS rounds — every node updates from the previous
    * round's labels — and a total tie order: new label = the neighbor
    * label with the highest frequency, ties broken toward the SMALLEST
    * label. Both engines replay the identical trajectory, so per-node
    * labels hash-match exactly.
    *
    * Scale shape (100 TB): same skeleton as [[pagerank]] — the edge list
    * pins once with its hash partitioning; each round moves only the
    * (node, label) frame through one join exchange and one two-level
    * aggregation (per-(dst,label) counts partial-aggregate map-side —
    * hub fan-in combines before the shuffle — then a per-dst `max_by`
    * argmax, aggregate not window, so no per-node sort of candidate
    * lists). Rounds are a fixed constant: bounded plan depth, no
    * convergence loop, lineage recomputable without checkpoints. */
  private def labelPropagation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = encodedPairs(spark, sfDir)
    val edges = Materialize.once(pairs
      .select(explode(array(
        struct($"a".as("src"), $"b".as("dst")),
        struct($"b".as("src"), $"a".as("dst")))).as("e"))
      .select($"e.src".as("src"), $"e.dst".as("dst")))
    var labels = edges.select($"src".as("node")).distinct()
      .withColumn("lbl", $"node")
    for (_ <- 1 to LpaRounds) {
      labels = edges
        .join(labels.select($"node".as("src"), $"lbl".as("nl")), Seq("src"))
        .groupBy($"dst", $"nl").agg(count(lit(1)).as("cnt"))
        // argmax by (count DESC, label ASC): max of (cnt, -nl) is a total
        // order per dst (labels are distinct within a dst group), so the
        // winner is unique and engine-independent.
        .groupBy($"dst").agg(
          max_by($"nl", struct($"cnt", (-$"nl").as("neg"))).as("lbl"))
        .select($"dst".as("node"), $"lbl")
    }
    def side(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(c % 2 === 0, concat(lit("c"), (c / 2).cast("long")))
        .otherwise(concat(lit("s"), ((c - 1) / 2).cast("long")))
    labels.select(side($"node").as("node"), side($"lbl").as("community"))
      .orderBy($"node")
  }

  /** Degree distribution of the trade graph, per side — the first
    * diagnostic run before ANY iterative graph algorithm (it dictates the
    * skew strategy: hub degrees decide salting/AQE-skew handling for
    * [[pagerank]]'s joins and the orientation win for [[triangleCount]]).
    * Histogram of node degree by node side (customer/supplier).
    *
    * Scale shape (100 TB): degree = one partial-aggregated groupBy per
    * side over the distinct edge list; the histogram re-aggregates the
    * (tiny) per-node frame. Output is bounded by max degree, not node
    * count. */
  private def degreeHist(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // already pinned (PinnedInputs) — no per-query Materialize needed
    val pairs = PinnedInputs.tradePairs(spark, sfDir)
      .select($"c".as("a"), $"s".as("b"))
    val deg = pairs.groupBy($"a").agg(count(lit(1)).as("deg"))
      .select(lit("c").as("side"), $"deg")
      .unionByName(pairs.groupBy($"b").agg(count(lit(1)).as("deg"))
        .select(lit("s").as("side"), $"deg"))
    deg.groupBy($"side", $"deg")
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy($"side", $"deg")
  }

  private val LinkFocusN = 50

  /** Common-neighbor LINK PREDICTION over the bipartite trade graph: for
    * every pair of FOCUS customers (top-[[LinkFocusN]] by supplier
    * degree, deterministic ties to the lowest key), the number of shared
    * suppliers and the neighbor-set Jaccard |N(a)∩N(b)| / |N(a)∪N(b)| —
    * the classical link-prediction / node-similarity score
    * (Liben-Nowell & Kleinberg 2003) and the relational form of a
    * "customers who buy from the same suppliers" recommender.
    *
    * Scale shape (100 TB): the full wedge expansion Σ_s deg(s)² is the
    * known quadratic of common-neighbor scoring, so the pair space is
    * BOUNDED UP FRONT by the focus set — the standard production move
    * (score a candidate/query set, not all pairs; the same
    * bounded-candidate discipline as the LSH dedups). Degrees and the
    * focus set reduce from one distinct edge pass; focus membership
    * broadcasts back as a semi-filter, so the wedge join runs over
    * ≤ focus×suppliers edges — candidates from an EQUI-join on the
    * shared-supplier key, never a cross product. Jaccard needs no
    * second corpus pass: |N(a)∪N(b)| = deg(a)+deg(b)−common from the
    * already-reduced degree frame (full-graph degrees, broadcast). */
  private def linkPredict(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = PinnedInputs.tradePairs(spark, sfDir)
    val focus = Materialize.once(
      p.groupBy($"c").agg(count(lit(1)).as("deg"))
        .orderBy($"deg".desc, $"c".asc).limit(LinkFocusN))
    val fe = p.join(broadcast(focus.select($"c")), Seq("c"))
    val pairs = fe.select($"c".as("c1"), $"s")
      .join(fe.select($"c".as("c2"), $"s"), Seq("s"))
      .filter($"c1" < $"c2")
      .groupBy($"c1", $"c2").agg(count(lit(1)).as("common"))
    pairs
      .join(broadcast(focus.select($"c".as("c1"), $"deg".as("deg1"))), Seq("c1"))
      .join(broadcast(focus.select($"c".as("c2"), $"deg".as("deg2"))), Seq("c2"))
      .select($"c1", $"c2", $"common",
        pround($"common".cast("double") / ($"deg1" + $"deg2" - $"common"), 6)
          .as("jaccard"))
      .orderBy($"c1", $"c2")
  }

  private val KcoreK = 8
  private val KcoreRounds = 4

  /** [[KcoreK]]-core of the customer–supplier graph by synchronous
    * iterative peeling (Seidman 1983; the Pregel/peeling formulation):
    * each round drops every node whose CURRENT degree is below k along
    * with its incident edges, until the survivors all have in-core
    * degree ≥ k. The densest-cohesion screen a graph pipeline runs
    * before community detection or embedding (spam rings and scrape
    * artifacts live in low-coreness shells; the k-core is the stable
    * backbone). [[KcoreRounds]] synchronous rounds — the fixture's peel
    * converges in 1 (GraphSpec asserts min core degree ≥ k end-state;
    * the cascade path is unit-tested on a crafted tail graph).
    *
    * Scale shape (100 TB): each round is ONE partial-aggregated degree
    * pass over the surviving edge list plus two semi-joins against the
    * (node-sized, auto-broadcast while it fits) alive set — the edge
    * list only ever SHRINKS, and nothing is quadratic. The peel is
    * monotone, so unrolled synchronous rounds compute the same fixpoint
    * as sequential peeling once converged.
    *
    * Determinism: degrees are integers; membership is a set test — no
    * floats anywhere. */
  private def kcore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = encodedPairs(spark, sfDir)
    val sym = pairs
      .select(explode(array(
        struct($"a".as("src"), $"b".as("dst")),
        struct($"b".as("src"), $"a".as("dst")))).as("e"))
      .select($"e.src".as("src"), $"e.dst".as("dst"))
    val fin = kcoreOf(sym, KcoreK, KcoreRounds)
    fin.select(
        when($"node" % 2 === 0, concat(lit("c"), ($"node" / 2).cast("long")))
          .otherwise(concat(lit("s"), (($"node" - 1) / 2).cast("long")))
          .as("node"),
        $"core_deg")
      .orderBy($"node")
  }

  /** The peel loop on a symmetric (src, dst) edge list — package-visible
    * so tests can drive crafted graphs through the cascade. Returns the
    * surviving (node, core_deg) frame.
    *
    * Each round's survivor list is re-rooted with [[Materialize.pin]]
    * (LogicalRDD leaf), NOT plan-level persist: a round references its
    * input THREE times (the degree pass plus both endpoint semi-joins),
    * so an un-re-rooted plan embeds round r−1's tree 3× and the logical
    * plan grows 3^rounds — at 4 rounds the formatted plan was ~2000 lines
    * and Catalyst re-analyzed all 81 copies per action (the same
    * geometric-reference trap the connected-components loop documents).
    * Pinned, every round re-analyzes a leaf: plan depth is linear and the
    * executed work is identical (the persist already deduped it). */
  private[graft] def kcoreOf(sym: DataFrame, k: Int, rounds: Int): DataFrame = {
    import sym.sparkSession.implicits._
    // Pin-handle contract ([[Materialize.pin]]; round-15 advice): each
    // round materializes eagerly, then round r−1's persisted RDD is
    // RELEASED — a discarded handle kept every round's full edge list
    // pinned for the life of the query (rounds × |E| dead blocks at
    // 100 TB). The eager count is the same work the final action would
    // have pipelined; only the last round's (still-needed) pin survives
    // until the caller's between-query cleanup.
    var (edges, handle) = Materialize.pin(sym)
    for (_ <- 1 to rounds) {
      val (next, nextHandle) = Materialize.pin(kcoreRound(edges, k))
      nextHandle.count() // materialize round r before releasing r−1
      handle.unpersist(blocking = false)
      edges = next
      handle = nextHandle
    }
    edges.groupBy($"src".as("node")).agg(count(lit(1)).as("core_deg"))
  }

  /** One un-pinned peel round (degree pass + both endpoint semi-joins) —
    * the plan [[kcoreOf]] pins per round; split out so PlanSpec can assert
    * the semi-join shape on the round plan itself (the pinned leaves hide
    * it from the final frame's explain). */
  private[graft] def kcoreRound(edges: DataFrame, k: Int): DataFrame = {
    import edges.sparkSession.implicits._
    val alive = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
      .filter($"deg" >= k)
      .select($"src".as("node"))
    edges
      .join(alive.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .join(alive.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
      .select($"src", $"dst")
  }

  /** Newman modularity Q of the NATION partition over the customer–
    * supplier trade graph — "is trade clustered within nations?" — the
    * community-QUALITY metric that closes the community loop the same way
    * `embed_cluster_purity` closes k-means and `sim_ann_recall_eval`
    * closes ANN: given any node partition (here the nation attribute; a
    * detected community column drops in unchanged), per community c
    * report e_c (within edges), d_c (degree sum) and the contribution
    * e_c/m − (d_c/2m)², whose sum is Q (Newman & Girvan 2004).
    *
    * Scale shape (100 TB): the edge list is the one orders⋈lineitem
    * join + distinct (pagerank's construction); nation labels attach by
    * two co-partitioned key joins; then EVERYTHING aggregates — degree
    * cells by an explode to (community) keys, within-edges by a filtered
    * count — to ≤|nations| rows, and m broadcasts back as one row. No
    * iteration, no quadratic term, bounded output. */
  private def modularity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Materialize.once(
      PinnedInputs.tradePairs(spark, sfDir)
        .select($"c".as("ck"), $"s".as("sk"))
        .join(Tables.customer(spark, sfDir)
          .select($"c_custkey".as("ck"), $"c_nationkey".as("cn")), "ck")
        .join(Tables.supplier(spark, sfDir)
          .select($"s_suppkey".as("sk"), $"s_nationkey".as("sn")), "sk")
        .select($"cn", $"sn"))
    val m = e.agg(count(lit(1)).as("m"))
    val deg = e.select(explode(array($"cn", $"sn")).as("c"))
      .groupBy($"c").agg(count(lit(1)).as("d_c"))
    val win = e.filter($"cn" === $"sn")
      .groupBy($"cn".as("c")).agg(count(lit(1)).as("e_c"))
    deg.join(win, Seq("c"), "left_outer")
      .na.fill(0L, Seq("e_c"))
      .crossJoin(broadcast(m))
      .withColumn("half", $"d_c".cast("double") / (lit(2.0) * $"m"))
      .select($"c".as("nationkey"), $"e_c", $"d_c",
        pround($"e_c".cast("double") / $"m" - $"half" * $"half", 6)
          .as("q_contrib"))
      .orderBy($"nationkey")
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over the symmetrized edge list — "do hubs trade
    * with hubs?" — the one-number structural summary that separates
    * social-style graphs (r > 0) from technological/bipartite ones
    * (r < 0; this customer–supplier graph is bipartite, so expect
    * disassortative). Complements [[degreeHist]] (the marginal) with the
    * joint.
    *
    * Scale shape (100 TB): the edge build is the shared one join +
    * distinct; degrees are one partial-aggregated pass; the two degree
    * attaches are node-key joins; then EVERYTHING reduces to one row of
    * integer moments. Determinism: degrees are exact integers, the five
    * moment sums are exact BIGINTs, and the closing Pearson formula runs
    * on 38-digit-decimal products (BIGINT² overflows) converted to
    * identical doubles in both engines — one sqrt, one division. */
  private def assortativity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = encodedPairs(spark, sfDir)
    val sym = Materialize.once(pairs
      .select(explode(array(
        struct($"a".as("src"), $"b".as("dst")),
        struct($"b".as("src"), $"a".as("dst")))).as("e"))
      .select($"e.src".as("src"), $"e.dst".as("dst")))
    val deg = sym.groupBy($"src".as("node")).agg(count(lit(1)).as("d"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    sym
      .join(deg.select($"node".as("src"), $"d".as("dx")), "src")
      .join(deg.select($"node".as("dst"), $"d".as("dy")), "dst")
      .agg(count(lit(1)).as("m"), sum($"dx").as("sx"), sum($"dy").as("sy"),
        sum($"dx" * $"dy").as("sxy"), sum($"dx" * $"dx").as("sxx"),
        sum($"dy" * $"dy").as("syy"))
      .select($"m",
        pround((dec($"m") * dec($"sxy") - dec($"sx") * dec($"sy")).cast("double") /
          sqrt((dec($"m") * dec($"sxx") - dec($"sx") * dec($"sx")).cast("double") *
               (dec($"m") * dec($"syy") - dec($"sy") * dec($"sy")).cast("double")),
          6).as("assortativity"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_assortativity" -> assortativity,
    "graph_modularity" -> modularity,
    "graph_kcore" -> kcore,
    "graph_link_predict" -> linkPredict,
    "graph_degree_hist" -> degreeHist,
    "graph_pagerank" -> pagerank,
    "graph_triangle_count" -> triangleCount,
    "graph_clustering_coeff" -> clusteringCoeff,
    "graph_bfs_distance" -> bfsDistance,
    "graph_label_propagation" -> labelPropagation
  )

  override def oracles: Map[String, String] = Map(
    // sym is MATERIALIZED (degree pass + two attaches); HUGEINT keeps
    // the moment products exact before the one double conversion.
    "graph_assortativity" ->
      """WITH p AS (
        |  SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |sym AS MATERIALIZED (
        |  SELECT a AS src, b AS dst FROM p
        |  UNION ALL SELECT b AS src, a AS dst FROM p),
        |deg AS (SELECT src AS node, count(*) AS d FROM sym GROUP BY 1),
        |mm AS (
        |  SELECT count(*) AS m, sum(dx.d) AS sx, sum(dy.d) AS sy,
        |         sum(dx.d * dy.d) AS sxy, sum(dx.d * dx.d) AS sxx,
        |         sum(dy.d * dy.d) AS syy
        |  FROM sym JOIN deg dx ON sym.src = dx.node
        |           JOIN deg dy ON sym.dst = dy.node)
        |SELECT CAST(m AS BIGINT) AS m,
        |       floor(CAST(CAST(m AS HUGEINT) * CAST(sxy AS HUGEINT) -
        |                  CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) /
        |             sqrt(CAST(CAST(m AS HUGEINT) * CAST(sxx AS HUGEINT) -
        |                       CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE) *
        |                  CAST(CAST(m AS HUGEINT) * CAST(syy AS HUGEINT) -
        |                       CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE))
        |             * 1e6 + 0.5) / 1e6 AS assortativity
        |FROM mm""".stripMargin,
    // e is MATERIALIZED: referenced three times (m, degrees, within).
    "graph_modularity" ->
      """WITH e AS MATERIALIZED (
        |  SELECT c.c_nationkey AS cn, s.s_nationkey AS sn
        |  FROM (SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
        |        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey) p
        |  JOIN customer c ON p.ck = c.c_custkey
        |  JOIN supplier s ON p.sk = s.s_suppkey),
        |m AS (SELECT count(*) AS m FROM e),
        |deg AS (
        |  SELECT c, count(*) AS d_c FROM (
        |    SELECT unnest([cn, sn]) AS c FROM e) GROUP BY c),
        |win AS (SELECT cn AS c, count(*) AS e_c FROM e WHERE cn = sn GROUP BY cn)
        |SELECT deg.c AS nationkey,
        |       CAST(coalesce(win.e_c, 0) AS BIGINT) AS e_c,
        |       CAST(deg.d_c AS BIGINT) AS d_c,
        |       floor((CAST(coalesce(win.e_c, 0) AS DOUBLE) / m.m -
        |              (CAST(deg.d_c AS DOUBLE) / (2.0 * m.m)) *
        |              (CAST(deg.d_c AS DOUBLE) / (2.0 * m.m))) * 1e6 + 0.5) / 1e6
        |         AS q_contrib
        |FROM deg LEFT JOIN win USING (c) CROSS JOIN m
        |ORDER BY nationkey""".stripMargin,
    // Peel rounds unrolled; every alive/edge CTE MATERIALIZED (each is
    // referenced twice — membership test on both endpoints — so plain
    // CTE inlining would re-evaluate geometrically across rounds).
    "graph_kcore" -> {
      val base =
        """WITH ed0 AS (
          |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          |e0 AS MATERIALIZED (
          |  SELECT a AS src, b AS dst FROM ed0
          |  UNION ALL SELECT b AS src, a AS dst FROM ed0)""".stripMargin
      val rounds = (1 to KcoreRounds).map { r =>
        s"""a$r AS MATERIALIZED (
           |  SELECT src AS node FROM e${r - 1}
           |  GROUP BY src HAVING count(*) >= $KcoreK),
           |e$r AS MATERIALIZED (
           |  SELECT src, dst FROM e${r - 1}
           |  WHERE src IN (SELECT node FROM a$r)
           |    AND dst IN (SELECT node FROM a$r))""".stripMargin
      }.mkString(",\n", ",\n", "")
      base + rounds +
        s"""
           |SELECT CASE WHEN src % 2 = 0 THEN 'c' || CAST(src // 2 AS BIGINT)
           |            ELSE 's' || CAST((src - 1) // 2 AS BIGINT) END AS node,
           |       count(*) AS core_deg
           |FROM e$KcoreRounds GROUP BY src ORDER BY node""".stripMargin
    },
    // The identical synchronous trajectory, rounds unrolled as CTEs
    // (the graph_pagerank convention); every round MATERIALIZED — the
    // argmax subquery references its round input once, but inlining a
    // chain of unrolled rounds is exactly the geometric-re-evaluation
    // trap the embed_pca_power oracle hit, so each round evaluates once
    // by construction.
    "graph_label_propagation" -> {
      val base =
        """WITH ed0 AS (
          |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          |edges AS MATERIALIZED (
          |  SELECT a AS src, b AS dst FROM ed0
          |  UNION ALL SELECT b AS src, a AS dst FROM ed0),
          |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges)""".stripMargin
      val rounds = (1 to LpaRounds).map { r =>
        s"""l$r AS MATERIALIZED (
           |  SELECT node, lbl FROM (
           |    SELECT node, lbl,
           |           row_number() OVER (PARTITION BY node
           |                              ORDER BY cnt DESC, lbl ASC) AS rn
           |    FROM (SELECT e.dst AS node, p.lbl AS lbl, count(*) AS cnt
           |          FROM edges e JOIN l${r - 1} p ON p.node = e.src
           |          GROUP BY e.dst, p.lbl))
           |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n", ",\n", "")
      base + rounds +
        s"""
           |SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS BIGINT)
           |            ELSE 's' || CAST((node - 1) // 2 AS BIGINT) END AS node,
           |       CASE WHEN lbl % 2 = 0 THEN 'c' || CAST(lbl // 2 AS BIGINT)
           |            ELSE 's' || CAST((lbl - 1) // 2 AS BIGINT) END AS community
           |FROM l$LpaRounds ORDER BY node""".stripMargin
    },
    "graph_link_predict" ->
      s"""WITH p AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
         |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |deg AS (SELECT c, CAST(count(*) AS BIGINT) AS deg FROM p GROUP BY c),
         |focus AS (SELECT c, deg FROM deg ORDER BY deg DESC, c ASC
         |          LIMIT $LinkFocusN),
         |fe AS (SELECT p.c, p.s FROM p JOIN focus USING (c)),
         |w AS (SELECT a.c AS c1, b.c AS c2, CAST(count(*) AS BIGINT) AS common
         |      FROM fe a JOIN fe b ON a.s = b.s AND a.c < b.c GROUP BY 1, 2)
         |SELECT w.c1, w.c2, w.common,
         |       floor(CAST(w.common AS DOUBLE) / (d1.deg + d2.deg - w.common)
         |             * 1e6 + 0.5) / 1e6 AS jaccard
         |FROM w JOIN focus d1 ON d1.c = w.c1 JOIN focus d2 ON d2.c = w.c2
         |ORDER BY c1, c2""".stripMargin,
    "graph_degree_hist" ->
      """WITH p AS (SELECT DISTINCT o_custkey AS a, l_suppkey AS b
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |d AS (
        |  SELECT 'c' AS side, CAST(count(*) AS BIGINT) AS deg FROM p GROUP BY a
        |  UNION ALL
        |  SELECT 's', CAST(count(*) AS BIGINT) FROM p GROUP BY b)
        |SELECT side, deg, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM d GROUP BY side, deg ORDER BY side, deg""".stripMargin,
    "graph_bfs_distance" ->
      s"""WITH RECURSIVE ed0 AS (
         |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |edges AS (
         |  SELECT a AS src, b AS dst FROM ed0
         |  UNION ALL SELECT b AS src, a AS dst FROM ed0),
         |walk(node, dist) AS (
         |  SELECT CAST($BfsSource AS BIGINT), CAST(0 AS BIGINT)
         |  UNION
         |  SELECT e.dst, w.dist + 1
         |  FROM walk w JOIN edges e ON e.src = w.node
         |  WHERE w.dist < $BfsRounds),
         |d AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist
         |      FROM walk GROUP BY node)
         |SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS BIGINT)
         |            ELSE 's' || CAST((node - 1) // 2 AS BIGINT) END AS node,
         |       dist
         |FROM d ORDER BY node""".stripMargin,
    // The same 5 rounds unrolled as CTEs — both engines replay identical
    // arithmetic; float sum-order differences sit ~1e-15, far from the
    // 6-decimal reporting boundary.
    "graph_pagerank" -> {
      // e0/edges/deg/nv are consumed by EVERY unrolled round below —
      // without MATERIALIZED, DuckDB re-inlines the 60M-row orders ⋈
      // lineitem build per consumer and exhausted 60+ GB of temp disk at
      // the 100× replica set (the multi-consumer convention the other
      // graph oracles already follow).
      val base =
        """WITH e0 AS MATERIALIZED (
          |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
          |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
          |edges AS MATERIALIZED (
          |  SELECT a AS src, b AS dst FROM e0
          |  UNION ALL SELECT b AS src, a AS dst FROM e0),
          |deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY src),
          |nv AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
          |r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) / n AS r
          |       FROM deg CROSS JOIN nv)""".stripMargin
      val rounds = (1 to Rounds).map { i =>
        s"""r$i AS (
           |  SELECT e.dst AS node,
           |         CAST(0.15 AS DOUBLE) / max(nv.n)
           |           + CAST(0.85 AS DOUBLE) * sum(p.r / d.deg) AS r
           |  FROM edges e
           |  JOIN r${i - 1} p ON p.node = e.src
           |  JOIN deg d ON d.src = e.src
           |  CROSS JOIN nv
           |  GROUP BY e.dst)""".stripMargin
      }.mkString(",\n", ",\n", "")
      base + rounds +
        s"""
           |SELECT node, floor(r * 1000 * 1e6 + 0.5) / 1e6 AS r1000
           |FROM r$Rounds ORDER BY node""".stripMargin
    },
    // Same degree-oriented wedge machinery as graph_triangle_count, with
    // the pivot kept so triangles unnest to per-node counts. Every
    // multi-consumer CTE is MATERIALIZED (DuckDB inlines otherwise).
    "graph_clustering_coeff" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s
        |            FROM lineitem WHERE l_orderkey % 10 = 0),
        |pairs AS MATERIALIZED (SELECT DISTINCT x.s AS u, y.s AS v
        |          FROM li x JOIN li y ON x.ok = y.ok AND x.s < y.s),
        |deg AS MATERIALIZED (SELECT node, count(*) AS deg
        |        FROM (SELECT u AS node FROM pairs
        |              UNION ALL SELECT v FROM pairs) GROUP BY 1),
        |o AS MATERIALIZED (
        |  SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS a,
        |         CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS b,
        |         CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS db
        |  FROM (SELECT pairs.u, pairs.v, d1.deg AS du, d2.deg AS dv
        |        FROM pairs
        |        JOIN deg d1 ON d1.node = pairs.u
        |        JOIN deg d2 ON d2.node = pairs.v)),
        |tri AS MATERIALIZED (
        |  SELECT e1.a AS p, e1.b AS wb, e2.b AS wc
        |  FROM o e1 JOIN o e2 ON e1.a = e2.a
        |       AND (e1.db < e2.db OR (e1.db = e2.db AND e1.b < e2.b))
        |  JOIN o e3 ON e1.b = e3.a AND e2.b = e3.b),
        |tn AS (SELECT node, count(*) AS t FROM (
        |         SELECT p AS node FROM tri
        |         UNION ALL SELECT wb FROM tri
        |         UNION ALL SELECT wc FROM tri) GROUP BY 1),
        |loc AS (
        |  SELECT sum(CAST(floor(2.0 * coalesce(t, 0) / (deg * (deg - 1))
        |                        * 1e6 + 0.5) AS BIGINT)) AS qsum,
        |         count(*) AS n_elig
        |  FROM deg LEFT JOIN tn ON deg.node = tn.node WHERE deg >= 2),
        |tot AS (SELECT count(*) AS n_nodes, sum(deg * (deg - 1)) AS w2 FROM deg),
        |nt AS (SELECT count(*) AS n_triangles FROM tri)
        |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
        |       CAST(n_triangles AS BIGINT) AS n_triangles,
        |       floor(6.0 * n_triangles / w2 * 1e6 + 0.5) / 1e6 AS transitivity,
        |       floor(CAST(qsum AS DOUBLE) / 1e6 / n_elig * 1e6 + 0.5) / 1e6 AS avg_local_cc
        |FROM tot, nt, loc""".stripMargin,
    "graph_triangle_count" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s
        |            FROM lineitem WHERE l_orderkey % 10 = 0),
        |pairs AS (SELECT DISTINCT x.s AS u, y.s AS v
        |          FROM li x JOIN li y ON x.ok = y.ok AND x.s < y.s),
        |deg AS (SELECT node, count(*) AS deg
        |        FROM (SELECT u AS node FROM pairs
        |              UNION ALL SELECT v FROM pairs) GROUP BY 1),
        |o AS (SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS a,
        |             CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS b,
        |             CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS db
        |      FROM (SELECT pairs.u, pairs.v, d1.deg AS du, d2.deg AS dv
        |            FROM pairs
        |            JOIN deg d1 ON d1.node = pairs.u
        |            JOIN deg d2 ON d2.node = pairs.v)),
        |w AS (SELECT e1.b AS wb, e2.b AS wc FROM o e1 JOIN o e2
        |      ON e1.a = e2.a AND (e1.db < e2.db OR (e1.db = e2.db AND e1.b < e2.b))),
        |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
        |        FROM w JOIN o e3 ON w.wb = e3.a AND w.wc = e3.b)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
        |       (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
        |       n_triangles
        |FROM tri""".stripMargin
  )
}
