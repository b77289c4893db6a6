package graft.llm

import graft.QueryModule
import graft.functions.PortableRound.pround
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval (SURVEY.md §2.11 north-star extension): fusing a
  * sparse lexical ranking ([[Text.bm25Top]], Okapi BM25) with a dense
  * embedding ranking ([[Similarity.topkCosine]]) — the two-tower lookup
  * every modern RAG / retrieval-based-curation stack runs (the reference's
  * analytics stop at Athena top-N, `upsert_athena_aggregates.py:40-50`;
  * this is that surface's retrieval-age analog, per BASELINE.json's
  * "similarity search" north star).
  *
  * Fusion is Reciprocal Rank Fusion (Cormack & Clarke SIGIR'09):
  * score(d) = Σ_lists 1/(60 + rank_list(d)) — rank-based, so the two
  * lists' incomparable score scales (BM25 logs vs cosine) never mix; the
  * 60 is the canonical damping constant from the paper (also Elastic /
  * Vespa / pgvector-hybrid's default).
  */
object Retrieval extends QueryModule {

  /** RRF fusion of BM25 top-20 (query "join vector stream") and dense
    * cosine top-20 (the deterministic query vector), over the shared
    * doc_id == vec_id key space; top-10 fused.
    *
    * Scale shape (100 TB): each branch is its own pipeline unchanged —
    * BM25 = one query-term-filtered corpus aggregation + broadcast df/
    * stats attach; dense = broadcast query + linear scan +
    * TakeOrderedAndProject. Fusion itself touches two ≤20-row frames:
    * the rank windows and the full-outer join run on k rows, not data.
    * At 100 TB you raise k, not the shape — the fused join stays k-row. */
  private def hybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // 20-row frames: these global windows sort k rows, not the corpus
    // (the branch LIMITs above them are the scale guard).
    val sw = Window.orderBy($"bm25".desc, $"doc_id".asc)
    val sparse = Text.bm25Top(spark, sfDir, 20)
      .withColumn("srank", row_number().over(sw).cast("long"))
      .select($"doc_id", $"srank")
    val dw = Window.orderBy($"cos_sim".desc, $"vec_id".asc)
    val dense = Similarity.topkCosine(spark, sfDir, 20)
      .withColumn("drank", row_number().over(dw).cast("long"))
      .select($"vec_id".as("doc_id"), $"drank")
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf", pround(
        coalesce(lit(1.0) / (lit(60L) + $"srank"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60L) + $"drank"), lit(0.0)), 6))
      .select($"doc_id", $"rrf", $"srank", $"drank")
      .orderBy($"rrf".desc, $"doc_id".asc)
      .limit(10)
  }

  override def queries: Map[String, QueryFn] = Map(
    "search_hybrid_rrf" -> hybridRrf
  )

  override def oracles: Map[String, String] = Map(
    // Both branch oracles replayed verbatim (MATERIALIZED so each list
    // evaluates once), then the identical rank windows + two-term
    // coalesce sum — summation order is fixed by the expression shape,
    // so the fused doubles are bit-identical before rounding.
    "search_hybrid_rrf" ->
      s"""WITH sparse AS MATERIALIZED (
         |${Text.bm25OracleSql(20)}),
         |sr AS (SELECT doc_id,
         |         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS srank
         |       FROM sparse),
         |dense AS MATERIALIZED (
         |${Similarity.topkOracle(20)}),
         |dr AS (SELECT vec_id AS doc_id,
         |         row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS drank
         |       FROM dense)
         |SELECT doc_id,
         |       floor((coalesce(1.0 / (60 + srank), 0.0) +
         |              coalesce(1.0 / (60 + drank), 0.0)) * 1e6 + 0.5) / 1e6 AS rrf,
         |       srank, drank
         |FROM sr FULL OUTER JOIN dr USING (doc_id)
         |ORDER BY rrf DESC, doc_id ASC LIMIT 10""".stripMargin
  )
}
