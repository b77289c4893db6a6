package graft.llm

import graft.{QueryModule, Tables}
import graft.functions.PortableRound.pround
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-space clustering for corpus curation (SURVEY.md §2.11
  * north-star): the SemDeDup/DSIR-style move — cluster document embeddings,
  * then dedup/sample WITHIN clusters so the expensive pairwise work only
  * ever runs on semantically-close candidates. K-means is the standard
  * coarse quantizer (it is also exactly the training step of the IVF index
  * family — `sim_ann_ivf` assigns against centroids like these).
  *
  * This is Lloyd's algorithm expressed declaratively, k=5 (the fixture's
  * label cardinality), two unrolled iterations, deterministic seeds (the
  * k lowest vec_ids — no RNG state, replayable cross-engine):
  *
  *   assign:   embeddings × broadcast(centroids) → squared-L2 → per-vector
  *             argmin as `min(struct(dist, cid))` (tie-break on cid — an
  *             AGGREGATE, not a window: no per-vector sort, same shape as
  *             `sim_ann_ivf`'s min_by gate).
  *   recenter: posexplode the assigned vectors → partial-aggregated
  *             groupBy(cid, pos) avg → re-assemble each centroid with
  *             `array_sort(collect_list(struct(pos, m)))` (k·dim cells
  *             total — trivially collect-able, but kept relational so the
  *             whole loop is one lineage, no driver round-trip).
  *
  * Scale shape (100 TB): the per-iteration cost is one broadcast nested
  * scan (centroids are k·dim doubles — KBs) plus one partial-aggregated
  * shuffle of k·dim cells; the corpus never hash-shuffles. That is the
  * canonical distributed k-means plan (MLlib's implementation is this
  * exact dataflow with a driver-side centroid collect per step).
  *
  * Cross-engine determinism: distances fold in a fixed left-to-right
  * double accumulation (`zip_with` + `aggregate`, matching DuckDB's
  * `list_sum(list_transform(...))`), argmin compares distances ROUNDED to
  * 1e-9 (ulp-reassociation noise is ~1e-13; ties after rounding break on
  * cid identically in both engines), and recentered components round to
  * 1e-6 before the next iteration re-canonicalizes — so the oracle replays
  * the full two-iteration trajectory hash-exact.
  */
object Clustering extends QueryModule {

  private val K = 5

  /** Squared L2 in portable form: per-element doubles, left-to-right fold.
    * Runs as the fused native loop ([[graft.functions.VecL2SqExpr]]) — the
    * previous `aggregate(zip_with(...))` higher-order form was
    * CodegenFallback (interpreted per element, one squared-diff array
    * allocated per (vector, centroid) pair) on the N×k assignment joins.
    * Identical left-to-right double accumulation of identical terms
    * (float→double widening is exact), so d2 values are bit-identical and
    * every oracle-checked trajectory is unchanged. */
  private def dist2(a: Column, c: Column): Column =
    graft.functions.VecDotNative.vec_l2sq_native(a, c)

  /** One Lloyd assignment: per-vector argmin over broadcast centroids. */
  private def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    e.crossJoin(broadcast(cents))
      .withColumn("d2", pround(dist2($"embedding", $"cvec"), 9))
      .groupBy($"vec_id")
      .agg(
        min(struct($"d2", $"cid")).as("r"),
        first($"embedding").as("emb"))
      .select($"vec_id", $"r.cid".as("cid"), $"r.d2".as("d2"), $"emb")
  }

  /** One Lloyd recenter: k·dim cell means, re-assembled in pos order. */
  private def recenter(assigned: DataFrame): DataFrame = {
    import assigned.sparkSession.implicits._
    assigned
      .select($"cid", posexplode($"emb").as(Seq("pos", "x")))
      .groupBy($"cid", $"pos")
      .agg(avg($"x".cast("double")).as("m"))
      .groupBy($"cid")
      .agg(transform(
        array_sort(collect_list(struct($"pos", $"m"))),
        s => pround(s.getField("m"), 6)).as("cvec"))
  }

  /** The converged (2-iteration) assignment — shared by the clustering
    * query and [[semanticDedup]]. Columns: vec_id, cid, d2, emb. */
  private def assignments(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val c0 = e.filter($"vec_id" < K)
      .select($"vec_id".as("cid"),
        transform($"embedding", x => x.cast("double")).as("cvec"))
    val a1 = assign(e, c0)
    val c1 = recenter(a1)
    assign(e, c1)
  }

  private def kmeans(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    assignments(spark, sfDir)
      .select($"vec_id", $"cid".as("cluster"), pround($"d2", 6).as("d2"))
      .orderBy($"vec_id")
  }

  /** SemDeDup (Abbas et al. 2023): semantic near-duplicate detection that
    * only ever scores pairs INSIDE a k-means cluster — the clustering is
    * the candidate generator, so the quadratic term is bounded per cluster
    * instead of per corpus (the embedding-space analog of the MinHash
    * band join in [[Dedup]]). A vector is a duplicate when an
    * earlier-id vector in its cluster has cosine ≥ τ; the kept set is
    * everything else (keep-lowest-id, same convention as the text dedups).
    *
    * Scale shape: assignment is [[assignments]] (broadcast centroids, no
    * corpus shuffle) materialized ONCE (three consumers — both pair sides
    * and the verdict restore; recomputing the Lloyd iterations per
    * consumer would triple the scan). The pair join is equi on cid, so
    * it shuffles each cluster to one stream and scores within — at 100 TB
    * you raise k until clusters fit (SemDeDup uses k≈10⁵ for 5B docs);
    * per-row norms precompute before the join exactly like
    * [[Similarity]]'s threshold join (measured 3× there). */
  private def semanticDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.VecDotNative.vec_norm_native
    val tau = 0.35
    val a2 = graft.rel.Materialize.pin(
      assignments(spark, sfDir).withColumn("nrm", vec_norm_native($"emb")))._1
    val a = a2.select($"cid", $"vec_id".as("a_id"), $"emb".as("va"), $"nrm".as("na"))
    val b = a2.select($"cid", $"vec_id".as("b_id"), $"emb".as("vb"), $"nrm".as("nb"))
    val close = a.join(b, Seq("cid"))
      .filter($"a_id" < $"b_id")
      .withColumn("cos",
        graft.functions.VecDotNative.vec_cosine_prenorm($"va", $"vb", $"na", $"nb"))
      .filter($"cos" >= tau)
    val verdict = close.groupBy($"b_id".as("vec_id"))
      .agg(count(lit(1)).as("n_close"),
        min($"a_id").as("dup_of"),
        pround(max($"cos"), 6).as("max_cos"))
    a2.select($"vec_id", $"cid".as("cluster"))
      .join(verdict, Seq("vec_id"), "left_outer")
      .select($"vec_id", $"cluster",
        coalesce($"n_close", lit(0L)).as("n_close"),
        $"dup_of", $"max_cos",
        $"n_close".isNotNull.as("is_dup"))
      .orderBy($"vec_id")
  }

  /** Embedding-space OUTLIER detection — flag vectors whose squared
    * distance to the global centroid z-scores ≥ 2: the standard
    * embedding-hygiene pass a pipeline runs before clustering/ANN indexing
    * (mis-embedded, truncated, or off-distribution inputs sit far from the
    * mass and poison centroid training). Completes the embedding toolkit
    * next to [[kmeans]] / `embed_quantize` / `embed_pca_*`.
    *
    * Scale shape (100 TB): the corpus NEVER hash-shuffles — the centroid
    * is a dim-cell partial aggregate ([[recenter]]'s shape), broadcast
    * back; distances are a map; the mean/sd of the distance distribution
    * is one scalar aggregate, broadcast back; the z-score is a map. Two
    * corpus scans of the pinned distance frame, zero wide exchanges.
    *
    * Determinism: centroid components micro-round (the [[recenter]]
    * convention), d2 is the fixed left-to-right [[dist2]] fold rounded to
    * 1e-9, mean/sd micro-round to integer micros before broadcast — so
    * both engines compute the z from identical doubles, and the rounded z
    * compares to the threshold identically. */
  private def embedOutlier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val mu = e.select(posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy($"pos")
      .agg(floor(avg($"x".cast("double")) * 1e6 + 0.5).cast("long").as("m"))
      .agg(sort_array(collect_list(struct($"pos", $"m"))).as("s"))
      .select(transform($"s",
        s => s.getField("m").cast("double") / 1e6).as("mu"))
    val d = graft.rel.Materialize.pin(
      e.crossJoin(broadcast(mu))
        .select($"vec_id", pround(dist2($"embedding", $"mu"), 9).as("d2")))._1
    val st = d.agg(
      floor(avg($"d2") * 1e6 + 0.5).cast("long").as("mean_m"),
      floor(stddev_pop($"d2") * 1e6 + 0.5).cast("long").as("sd_m"))
    d.crossJoin(broadcast(st))
      .select($"vec_id", pround($"d2", 6).as("d2"),
        pround(($"d2" - $"mean_m" / 1e6) / ($"sd_m" / 1e6), 6).as("z"))
      .withColumn("is_outlier", $"z" >= 2.0)
      .orderBy($"vec_id")
  }

  /** Power-iteration rounds for [[pcaPower]]. Convergence is geometric in
    * (λ₂/λ₁)ʳ; the fixture's modest eigen-gap leaves ~3% Rayleigh error
    * after 4 rounds (measured), so 8 — rounds touch only the dim²-row
    * scatter frame, so extra rounds cost microseconds of plan, not a
    * corpus scan. */
  private val PcaRounds = 8
  private val Dim = 64

  /** Leading principal component of the embedding corpus by POWER
    * ITERATION over the covariance matrix — the classical dimensionality
    * analysis an embedding pipeline runs before choosing a projection
    * (how much variance does one direction carry?), completing the
    * embedding toolkit next to [[kmeans]] (clustering),
    * `embed_random_projection` (data-independent reduction) and
    * `embed_quantize` (value compression).
    *
    * Scale shape (100 TB): the ONLY corpus-sized pass is the scatter
    * (covariance) build — the typed [[graft.functions.GramAggregator]]
    * accumulates each partition's packed upper-triangle Gram sums in a
    * tight integer loop with map-side partial aggregation, so the
    * shuffle carries one dim·(dim+1)/2-cell buffer per partition
    * regardless of corpus size (the standard distributed Gram-matrix
    * plan, at `sum`-like communication cost). The power rounds then
    * operate on a dim²-BOUNDED matrix — not distributed work at all —
    * so the scatter expands to one dense row-major array and all rounds
    * run as a single projection of higher-order functions: one job, no
    * per-round shuffle/broadcast scheduling. No driver-side matrix, no
    * per-round corpus scan.
    *
    * Cross-engine determinism, the hard part of an iterative float
    * algorithm: every DATA-SIZED sum is INTEGER — centered values
    * quantize to micros, the scatter accumulates exact BIGINT products,
    * the matvec accumulates BIGINT nano·micro products — so accumulation
    * order (Spark partials vs DuckDB) cannot perturb a single bit. The
    * only float reductions are the 64-term norm (fixed left-to-right
    * fold, the [[dist2]] convention) and the per-dim input mean (rounded
    * to micros, the [[recenter]] convention). v₀ = 1/√64 = 0.125 is
    * exact in binary AND in micros, so both engines start identically. */
  private def pcaPower(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (_, fin) = pcaParts(spark, sfDir)
    fin.select(posexplode($"st.v").as(Seq("pos", "vm")), $"st.nrm".as("nrm"))
      .select($"pos".cast("long").as("pos"),
        ($"vm".cast("double") / 1e6).as("loading"),
        // w = S_nano·v_micro ≈ (Cov·v)·1e15, so ‖w‖/1e15 is the Rayleigh
        // eigenvalue estimate in value² units
        pround($"nrm" / 1e15, 6).as("eigenvalue"))
      .orderBy($"pos")
  }

  /** Project every embedding onto the leading principal component — the
    * APPLICATION half of [[pcaPower]] (which learns the direction): the
    * 1-D coordinate a pipeline stores for variance-ranked filtering,
    * ordering, or as the first whitened feature. Deterministic by the
    * same integer discipline: the centered micro vector dots the micro
    * eigenvector in exact BIGINT (|dot| < 2^53), then one double
    * division by 1e12 (micros·micros) lands the coordinate — identical
    * bits in both engines.
    *
    * Scale shape (100 TB): the learned direction is ONE broadcast row;
    * the projection is a map-only pass over the corpus (no shuffle
    * beyond [[pcaParts]]' dim²-bounded scatter build). */
  private def pcaProject(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (cent, fin) = pcaParts(spark, sfDir)
    cent.crossJoin(broadcast(fin.select($"st.v".as("v"))))
      .select($"vec_id",
        (aggregate(zip_with($"c", $"v", (ci, vi) => ci * vi),
          lit(0L), (acc, x) => acc + x).cast("double") / 1e12).as("coord"))
      .orderBy($"vec_id")
  }

  /** Shared PCA power-iteration trajectory: returns (centered corpus
    * frame `(vec_id, c)`, 1-row final state `st = (v, nrm)` after
    * [[PcaRounds]] rounds). Both [[pcaPower]] and [[pcaProject]] compose
    * from these, so the reported loadings and the projection provably
    * use the SAME learned direction (the KmeansCtes convention). */
  private def pcaParts(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
    // Per-dim micro-rounded mean AND the corpus count in ONE pass — each
    // row contributes exactly one value per pos, so count(per-pos) = N;
    // no separate count() action/scan. Materialized (1 row) because both
    // the centering and the scatter normalization consume it.
    val mu = graft.rel.Materialize.once(
      e.select(posexplode($"embedding").as(Seq("pos", "x")))
        .groupBy($"pos")
        .agg(floor(avg($"x".cast("double")) * 1e6 + 0.5).cast("long").as("mu"),
          count(lit(1)).as("n"))
        .agg(sort_array(collect_list(struct($"pos", $"mu"))).as("s"),
          max($"n").as("n"))
        .select(transform($"s", s => s.getField("mu")).as("mu"), $"n"))
    val cent = e.crossJoin(broadcast(mu.select($"mu")))
      .select($"vec_id", transform($"embedding", (x, i) =>
        floor(x.cast("double") * 1e6 - element_at($"mu", i + 1) + lit(0.5))
          .cast("long")).as("c"))
    // The one corpus-sized pass: packed upper-triangle Gram sums via the
    // typed [[graft.functions.GramAggregator]] — a tight per-partition
    // integer loop with map-side partial aggregation, so the shuffle
    // carries ONE 2080-cell buffer per partition regardless of corpus
    // size. (The explode→groupBy formulation this replaces allocated
    // dim·(dim+1)/2 structs PER ROW just to feed a hash-agg — the
    // dominant cost of the query once the power rounds were folded.)
    val gram = cent.agg(
      graft.functions.GramAggregator.gram_upper($"c").as("g"))
    // Expand the packed triangle to the dense row-major matrix (cell
    // (i,j) lives at a·Dim − a·(a−1)/2 + (b−a) with a=min, b=max) and
    // normalize: micros² → covariance nanos, S/(N·1e3); |S| < 2^53 so
    // the double cast is exact and the division sequence is identical
    // in DuckDB.
    val mat = gram.crossJoin(broadcast(mu.select($"n")))
      .select(transform(sequence(lit(0), lit(Dim - 1)), i =>
        transform(sequence(lit(0), lit(Dim - 1)), j => {
          val a = least(i, j)
          val b = greatest(i, j)
          // Column./ is double division; a·(a−1) ≤ 63·62 so the double
          // quotient is exact and the int cast is lossless.
          val idx = (a * lit(Dim) - a * (a - lit(1)) / lit(2) + (b - a) +
            lit(1)).cast("int")
          floor(element_at($"g", idx).cast("double") / $"n".cast("double")
            / 1e3 + lit(0.5)).cast("long")
        })).as("S"))
    // The matrix is dim²-BOUNDED (4096 cells) no matter the corpus size,
    // so the power rounds are not distributed work at all: run ALL rounds
    // as ONE higher-order-function fold — one job, instead of 2 shuffle
    // stages + a broadcast per round (~24 tiny stages whose scheduling
    // overhead dominated the query: 6.9 s isolated at sf0.1). The
    // trajectory is bit-identical: the matvec is an INTEGER sum (order-
    // free), and the norm keeps the same left-to-right fold over
    // i-ascending terms as the grouped form it replaces.
    //
    // Expression-duplication discipline (the same trap the DuckDB oracle
    // hit with inlined CTEs, and a naive withColumn-per-round chain hits
    // via Catalyst's CollapseProject): each round uses its w vector twice
    // (norm + renormalize) and its norm twice, so chained projections
    // substitute sub-expressions geometrically across 8 rounds and the
    // plan never finishes optimizing. Here every intermediate binds
    // EXACTLY ONCE as a lambda variable — rounds via aggregate over
    // sequence(1, rounds), w and nrm via single-element transform(array(
    // e), x -> …) let-bindings — so the expression tree stays linear.
    val fin = mat.select(aggregate(
      sequence(lit(1), lit(PcaRounds)),
      struct(typedLit(Seq.fill(Dim)(125000L)).as("v"), lit(0.0).as("nrm")),
      (st, _) => {
        val w = transform($"S", row =>
          aggregate(zip_with(row, st.getField("v"), (s, vj) => s * vj),
            lit(0L), (acc, x) => acc + x))
        element_at(transform(array(w), wv =>
          element_at(transform(array(sqrt(aggregate(wv, lit(0.0),
              (acc, x) => acc + x.cast("double") * x.cast("double")))), nrm =>
            struct(
              transform(wv, x =>
                floor(x.cast("double") / nrm * 1e6 + lit(0.5)).cast("long"))
                .as("v"),
              nrm.as("nrm"))), 1)), 1)
      }).as("st"))
    (cent, fin)
  }

  /** Cluster-vs-label agreement (purity) of the [[assignments]] k-means
    * run against the fixture's ground-truth `label` column — the
    * clustering-quality eval a pipeline runs before trusting a clustering
    * for SemDeDup/IVF/sampling decisions (purity ≈ 1/k means the
    * clustering learned nothing; labels here are the generator's mixture
    * ids, so this doubles as the fixture's sanity check). Per cluster:
    * size, majority label (ties → lowest label id), and purity =
    * majority count / size.
    *
    * Scale shape (100 TB): the label attach is ONE equi-join on the
    * primary key (vec_id) against the same corpus the assignment read —
    * co-partitioned under AQE; everything after reduces to (cluster ×
    * label) cells, then k rows. The majority pick is an AGGREGATE argmax
    * (`max(struct(n, -label))`), not a window — no per-cluster sort.
    * Purity is one double division of exact BIGINTs — identical bits
    * cross-engine. */
  private def clusterPurity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lab = Tables.embeddings(spark, sfDir).select($"vec_id", $"label")
    val cells = assignments(spark, sfDir)
      .select($"vec_id", $"cid")
      .join(lab, Seq("vec_id"))
      .groupBy($"cid", $"label")
      .agg(count(lit(1)).as("n"))
    cells.groupBy($"cid")
      .agg(sum($"n").as("n_vecs"),
        max(struct($"n".as("n"), (-$"label").as("nl"))).as("top"))
      .select($"cid".as("cluster"), $"n_vecs",
        (-$"top.nl").as("majority_label"),
        $"top.n".as("n_majority"),
        pround($"top.n".cast("double") / $"n_vecs", 6).as("purity"))
      .orderBy($"cluster")
  }

  /** Embedding-distribution drift between ingest shards — the VECTOR
    * analog of `dq_drift_psi` (which monitors scalar histograms): per
    * label, the cosine between the mean embeddings of the even- and
    * odd-id halves. A healthy re-ingest keeps per-label centroids nearly
    * parallel (cos ≈ 1); an encoder version bump or upstream content
    * shift shows up as centroid rotation long before downstream metrics
    * move — the standard embedding-pipeline canary.
    *
    * Scale shape (100 TB): ONE corpus pass partial-aggregates the
    * exploded (label, half, dim) cells — bounded by labels × 2 × dim,
    * never by vectors; the centroid join and cosine reduce run entirely
    * on those cells. Determinism: each mean micro-quantizes at 1e-9
    * (float-sum order noise is ~1e-15, far below the quantum), so the
    * cells are cross-engine identical before the 64-term cosine sums. */
  private def centroidDrift(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.embeddings(spark, sfDir)
      .select($"label", ($"vec_id" % 2).as("half"),
        posexplode($"embedding").as(Seq("dim", "x")))
      .groupBy($"label", $"half", $"dim")
      .agg(sum($"x".cast("double")).as("s"), count(lit(1)).as("n"))
      .select($"label", $"half", $"dim",
        pround($"s" / $"n", 9).as("mu"), $"n")
    val a = cells.filter($"half" === 0)
      .select($"label", $"dim", $"mu".as("ma"), $"n".as("na"))
    val b = cells.filter($"half" === 1)
      .select($"label", $"dim", $"mu".as("mb"), $"n".as("nb"))
    a.join(b, Seq("label", "dim"))
      .groupBy($"label")
      .agg(sum($"ma" * $"mb").as("dot"), sum($"ma" * $"ma").as("qa"),
        sum($"mb" * $"mb").as("qb"), max($"na").as("n_a"), max($"nb").as("n_b"))
      .select($"label", $"n_a", $"n_b",
        pround($"dot" / (sqrt($"qa") * sqrt($"qb")), 6).as("centroid_cos"),
        pround(lit(1.0) - $"dot" / (sqrt($"qa") * sqrt($"qb")), 6).as("drift"))
      .orderBy($"label")
  }

  override def queries: Map[String, QueryFn] = Map(
    "embed_centroid_drift" -> centroidDrift,
    "embed_cluster_purity" -> clusterPurity,
    "embed_pca_power"   -> pcaPower,
    "embed_pca_project" -> pcaProject,
    "embed_kmeans"   -> kmeans,
    "embed_outlier"  -> embedOutlier,
    "dedup_semantic" -> semanticDedup
  )

  /** The two-iteration Lloyd trajectory as shared CTEs ending in `a2`
    * (vec_id, cid, d2) — prefix of both oracles so the dedup provably
    * scores inside the SAME clustering the kmeans query reports. */
  private val KmeansCtes: String =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |c0 AS (
      |  SELECT vec_id AS cid,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
      |  FROM e WHERE vec_id < 5),
      |d1 AS (
      |  SELECT e.vec_id, c0.cid, e.embedding,
      |    floor(list_sum(list_transform(range(1, len(e.embedding) + 1),
      |        i -> (CAST(e.embedding[i] AS DOUBLE) - c0.cvec[i])
      |           * (CAST(e.embedding[i] AS DOUBLE) - c0.cvec[i]))) * 1e9 + 0.5)
      |      / 1e9 AS d2
      |  FROM e CROSS JOIN c0),
      |a1 AS (
      |  SELECT vec_id, cid, embedding FROM (
      |    SELECT vec_id, cid, embedding,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      |    FROM d1) WHERE rn = 1),
      |c1 AS (
      |  SELECT cid, list(m ORDER BY pos) AS cvec FROM (
      |    SELECT cid, t.i AS pos,
      |           floor(avg(CAST(embedding[t.i] AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS m
      |    FROM a1, unnest(range(1, len(embedding) + 1)) AS t(i)
      |    GROUP BY cid, t.i)
      |  GROUP BY cid),
      |d2s AS (
      |  SELECT e.vec_id, c1.cid,
      |    floor(list_sum(list_transform(range(1, len(e.embedding) + 1),
      |        i -> (CAST(e.embedding[i] AS DOUBLE) - c1.cvec[i])
      |           * (CAST(e.embedding[i] AS DOUBLE) - c1.cvec[i]))) * 1e9 + 0.5)
      |      / 1e9 AS d2
      |  FROM e CROSS JOIN c1),
      |a2 AS (
      |  SELECT vec_id, cid, d2 FROM (
      |    SELECT vec_id, cid, d2,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      |    FROM d2s) WHERE rn = 1)""".stripMargin

  /** The identical integer-arithmetic power-iteration trajectory, rounds
    * unrolled as CTEs (the graph_pagerank convention).
    *
    * Every multiply-referenced CTE is `AS MATERIALIZED`: DuckDB inlines
    * plain CTEs, and because each round's `v$r` references `w$r` both
    * directly and through `n$r`'s scalar subquery, inlining re-evaluates
    * the corpus-sized scatter join a geometrically growing number of
    * times across the unrolled rounds (>15 min of pinned CPU at sf0.01).
    * Materialized, each CTE evaluates exactly once: 0.2 s at sf0.01. */
  private def pcaOracleCtes: String = {
    val base =
      s"""WITH nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
         |p AS MATERIALIZED (
         |      SELECT vec_id, t.i AS pos, CAST(embedding[t.i + 1] AS DOUBLE) AS x
         |      FROM embeddings, unnest(range(0, $Dim)) AS t(i)),
         |mu AS (SELECT pos, CAST(floor(avg(x) * 1e6 + 0.5) AS BIGINT) AS mu
         |       FROM p GROUP BY pos),
         |c AS MATERIALIZED (
         |      SELECT vec_id, p.pos, CAST(floor(x * 1e6 - mu + 0.5) AS BIGINT) AS ci
         |      FROM p JOIN mu USING (pos)),
         |s AS MATERIALIZED (
         |      SELECT a.pos AS i, b.pos AS j,
         |        CAST(floor(CAST(sum(a.ci * b.ci) AS DOUBLE) / (SELECT n FROM nv)
         |               / 1e3 + 0.5) AS BIGINT) AS s_nano
         |      FROM c a JOIN c b USING (vec_id) GROUP BY a.pos, b.pos),
         |v0 AS (SELECT t.i AS i, CAST(125000 AS BIGINT) AS vm
         |       FROM unnest(range(0, $Dim)) AS t(i))""".stripMargin
    val rounds = (1 to PcaRounds).map { r =>
      s"""w$r AS MATERIALIZED (
         |        SELECT s.i, sum(s.s_nano * v.vm) AS w
         |        FROM s JOIN v${r - 1} v ON v.i = s.j GROUP BY s.i),
         |n$r AS MATERIALIZED (
         |        SELECT sqrt(list_sum(list_transform(
         |          list(CAST(w AS DOUBLE) ORDER BY i), x -> x * x))) AS nrm
         |        FROM w$r),
         |v$r AS MATERIALIZED (
         |        SELECT i, CAST(floor(CAST(w AS DOUBLE) / (SELECT nrm FROM n$r)
         |               * 1e6 + 0.5) AS BIGINT) AS vm
         |        FROM w$r)""".stripMargin
    }.mkString(",\n", ",\n", "")
    base + rounds
  }

  private def pcaOracle: String =
    pcaOracleCtes +
      s"""
         |SELECT CAST(i AS BIGINT) AS pos, CAST(vm AS DOUBLE) / 1e6 AS loading,
         |       floor((SELECT nrm FROM n$PcaRounds) / 1e15 * 1e6 + 0.5) / 1e6
         |         AS eigenvalue
         |FROM v$PcaRounds ORDER BY pos""".stripMargin

  /** Projection oracle shares [[pcaOracleCtes]] verbatim, so the oracle
    * provably projects onto the SAME learned direction: exact integer
    * dot of the centered micros (`c`) with the final micro eigenvector,
    * one double division. */
  private def pcaProjectOracle: String =
    pcaOracleCtes +
      s"""
         |SELECT c.vec_id, CAST(sum(c.ci * v.vm) AS DOUBLE) / 1e12 AS coord
         |FROM c JOIN v$PcaRounds v ON v.i = c.pos
         |GROUP BY c.vec_id ORDER BY vec_id""".stripMargin

  override def oracles: Map[String, String] = Map(
    // dim is a join-internal ordinal (0-based in Spark's posexplode,
    // 1-based in WITH ORDINALITY) — consistent within each engine, never
    // output. Means micro-quantize identically before the cosine sums.
    "embed_centroid_drift" ->
      """WITH x AS (
        |  SELECT label, vec_id % 2 AS half, t.dim AS dim,
        |         CAST(embedding[t.dim] AS DOUBLE) AS v
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(dim)),
        |cells AS (
        |  SELECT label, half, dim,
        |         floor(sum(v) / count(*) * 1e9 + 0.5) / 1e9 AS mu,
        |         count(*) AS n
        |  FROM x GROUP BY 1, 2, 3),
        |a AS (SELECT label, dim, mu AS ma, n AS na FROM cells WHERE half = 0),
        |b AS (SELECT label, dim, mu AS mb, n AS nb FROM cells WHERE half = 1),
        |j AS (
        |  SELECT label, sum(ma * mb) AS dot, sum(ma * ma) AS qa,
        |         sum(mb * mb) AS qb, max(na) AS n_a, max(nb) AS n_b
        |  FROM a JOIN b USING (label, dim) GROUP BY label)
        |SELECT label, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |       floor(dot / (sqrt(qa) * sqrt(qb)) * 1e6 + 0.5) / 1e6 AS centroid_cos,
        |       floor((1.0 - dot / (sqrt(qa) * sqrt(qb))) * 1e6 + 0.5) / 1e6 AS drift
        |FROM j ORDER BY label""".stripMargin,
    "embed_cluster_purity" -> (KmeansCtes +
      """,
        |cells AS (SELECT a2.cid, e2.label, count(*) AS n
        |          FROM a2 JOIN embeddings e2 USING (vec_id) GROUP BY 1, 2),
        |tt AS (SELECT cid, sum(n) AS n_vecs FROM cells GROUP BY 1),
        |tp AS (SELECT cid, n, label FROM (
        |  SELECT cid, n, label,
        |         row_number() OVER (PARTITION BY cid ORDER BY n DESC, label ASC) AS rn
        |  FROM cells) WHERE rn = 1)
        |SELECT tt.cid AS cluster, CAST(n_vecs AS BIGINT) AS n_vecs,
        |       tp.label AS majority_label, CAST(tp.n AS BIGINT) AS n_majority,
        |       floor(CAST(tp.n AS DOUBLE) / n_vecs * 1e6 + 0.5) / 1e6 AS purity
        |FROM tt JOIN tp USING (cid) ORDER BY cluster""".stripMargin),
    "embed_pca_power" -> pcaOracle,
    "embed_pca_project" -> pcaProjectOracle,
    "embed_outlier" ->
      s"""WITH mu AS (
         |  SELECT list_transform(list(m ORDER BY pos),
         |                        x -> CAST(x AS DOUBLE) / 1e6) AS mu
         |  FROM (SELECT t.i AS pos,
         |          CAST(floor(avg(CAST(embedding[t.i + 1] AS DOUBLE)) * 1e6
         |                     + 0.5) AS BIGINT) AS m
         |        FROM embeddings, unnest(range(0, $Dim)) AS t(i)
         |        GROUP BY t.i)),
         |d AS (
         |  SELECT vec_id,
         |    floor(list_sum(list_transform(range(1, len(embedding) + 1),
         |        i -> (CAST(embedding[i] AS DOUBLE) - mu.mu[i])
         |           * (CAST(embedding[i] AS DOUBLE) - mu.mu[i]))) * 1e9 + 0.5)
         |      / 1e9 AS d2
         |  FROM embeddings CROSS JOIN mu),
         |st AS (
         |  SELECT CAST(floor(avg(d2) * 1e6 + 0.5) AS BIGINT) AS mean_m,
         |         CAST(floor(stddev_pop(d2) * 1e6 + 0.5) AS BIGINT) AS sd_m
         |  FROM d)
         |SELECT vec_id, floor(d2 * 1e6 + 0.5) / 1e6 AS d2,
         |       floor((d2 - mean_m / 1e6) / (sd_m / 1e6) * 1e6 + 0.5) / 1e6 AS z,
         |       floor((d2 - mean_m / 1e6) / (sd_m / 1e6) * 1e6 + 0.5) / 1e6
         |         >= 2.0 AS is_outlier
         |FROM d CROSS JOIN st
         |ORDER BY vec_id""".stripMargin,
    "embed_kmeans" -> (KmeansCtes +
      """
        |SELECT vec_id, cid AS cluster,
        |       floor(d2 * 1e6 + 0.5) / 1e6 AS d2
        |FROM a2 ORDER BY vec_id""".stripMargin),
    "dedup_semantic" -> (KmeansCtes +
      s""",
        |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (
        |  SELECT aa.vec_id AS a_id, bb.vec_id AS b_id,
        |         ${Similarity.cosSql("va.v", "vb.v")} AS cos
        |  FROM a2 aa JOIN a2 bb ON aa.cid = bb.cid AND aa.vec_id < bb.vec_id
        |  JOIN ev va ON va.vec_id = aa.vec_id
        |  JOIN ev vb ON vb.vec_id = bb.vec_id
        |  WHERE ${Similarity.cosSql("va.v", "vb.v")} >= 0.35),
        |v AS (
        |  SELECT b_id AS vec_id, CAST(count(*) AS BIGINT) AS n_close,
        |         min(a_id) AS dup_of,
        |         floor(max(cos) * 1e6 + 0.5) / 1e6 AS max_cos
        |  FROM p GROUP BY b_id)
        |SELECT a2.vec_id, a2.cid AS cluster,
        |       CAST(coalesce(n_close, 0) AS BIGINT) AS n_close,
        |       dup_of, max_cos, n_close IS NOT NULL AS is_dup
        |FROM a2 LEFT JOIN v USING (vec_id)
        |ORDER BY a2.vec_id""".stripMargin)
  )
}
