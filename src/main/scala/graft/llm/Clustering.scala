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

  private def kmeans(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val c0 = e.filter($"vec_id" < K)
      .select($"vec_id".as("cid"),
        transform($"embedding", x => x.cast("double")).as("cvec"))
    val a1 = assign(e, c0)
    val c1 = recenter(a1)
    val a2 = assign(e, c1)
    a2.select($"vec_id", $"cid".as("cluster"), pround($"d2", 6).as("d2"))
      .orderBy($"vec_id")
  }

  override def queries: Map[String, QueryFn] = Map(
    "embed_kmeans" -> kmeans
  )

  override def oracles: Map[String, String] = Map(
    "embed_kmeans" ->
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
        |  FROM e CROSS JOIN c1)
        |SELECT vec_id, cid AS cluster,
        |       floor(d2 * 1e6 + 0.5) / 1e6 AS d2
        |FROM (
        |  SELECT vec_id, cid, d2,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |  FROM d2s) WHERE rn = 1
        |ORDER BY vec_id""".stripMargin
  )
}
