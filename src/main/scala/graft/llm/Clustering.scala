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

  /** Squared L2 in portable form: per-element doubles, left-to-right fold. */
  private def dist2(a: Column, c: Column): Column =
    aggregate(
      zip_with(a, c, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (s, v) => s + v)

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
    import graft.functions.VecDotNative.{vec_dot_native, vec_norm_native}
    val tau = 0.35
    val a2 = graft.rel.Materialize.pin(
      assignments(spark, sfDir).withColumn("nrm", vec_norm_native($"emb")))._1
    val a = a2.select($"cid", $"vec_id".as("a_id"), $"emb".as("va"), $"nrm".as("na"))
    val b = a2.select($"cid", $"vec_id".as("b_id"), $"emb".as("vb"), $"nrm".as("nb"))
    val close = a.join(b, Seq("cid"))
      .filter($"a_id" < $"b_id")
      .withColumn("cos", vec_dot_native($"va", $"vb") / ($"na" * $"nb"))
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

  override def queries: Map[String, QueryFn] = Map(
    "embed_kmeans"   -> kmeans,
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

  override def oracles: Map[String, String] = Map(
    "embed_kmeans" -> (KmeansCtes +
      """
        |SELECT vec_id, cid AS cluster,
        |       floor(d2 * 1e6 + 0.5) / 1e6 AS d2
        |FROM a2 ORDER BY vec_id""".stripMargin),
    "dedup_semantic" -> (KmeansCtes +
      """,
        |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (
        |  SELECT aa.vec_id AS a_id, bb.vec_id AS b_id,
        |         list_dot_product(va.v, vb.v) /
        |           (sqrt(list_dot_product(va.v, va.v)) *
        |            sqrt(list_dot_product(vb.v, vb.v))) AS cos
        |  FROM a2 aa JOIN a2 bb ON aa.cid = bb.cid AND aa.vec_id < bb.vec_id
        |  JOIN ev va ON va.vec_id = aa.vec_id
        |  JOIN ev vb ON vb.vec_id = bb.vec_id
        |  WHERE list_dot_product(va.v, vb.v) /
        |          (sqrt(list_dot_product(va.v, va.v)) *
        |           sqrt(list_dot_product(vb.v, vb.v))) >= 0.35),
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
