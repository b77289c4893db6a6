package graft.llm

import graft.{QueryModule, Tables}
import graft.functions.PortableRound.pround
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family (SURVEY.md §2.11 L1-L2 + north-star extensions):
  * exact id, exact content-hash, MinHash+LSH near-dup, SimHash, and n-gram
  * Jaccard scoring — the standard LLM-training-data dedup toolbox.
  *
  * Reference lineage: at-least-once delivery makes duplicate events expected
  * downstream (`kafka/wiki-s3-consumer.py:66`, key choice
  * `kafka/wiki-producer.py:92-98`); the reference compacts via idempotent
  * re-aggregation — here dedup is a first-class operator instead.
  *
  * Scale notes (100 TB):
  *  - exact dedup = hash shuffle on the dedup key; with partial aggregation
  *    the shuffle carries one row per (partition, key).
  *  - MinHash/LSH: candidate generation is a shuffle on (band, bucket) —
  *    near-linear; only candidate pairs (sharing a bucket) get exact
  *    distances. This is the 100-TB path; all-pairs comparison is O(n²) and
  *    never runs here. Shingling (3-word) keeps random-doc Jaccard ≈ 0 so
  *    buckets stay sparse.
  *  - SimHash: one 64→32-bit signature per doc computed in a single codegen
  *    stage (no shuffle); near-dup lookup becomes an equality/band join on
  *    the signature.
  */
object Dedup extends QueryModule {

  /** L1a/T5 — exact dedup by id over an at-least-once (duplicated) stream:
    * the stream is simulated by unioning the source with itself. */
  private def dedupExactId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .select($"event_id", $"event_type", $"user_id")
    e.union(e)
      .dropDuplicates("event_id")
      .orderBy($"event_id")
  }

  /** L1b — exact content dedup: normalized-text hash, keep lowest doc_id
    * per hash (deterministic keep-first). */
  private def dedupTextHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"h").orderBy($"doc_id".asc)
    Tables.documents(spark, sfDir)
      .withColumn("h", md5(lower(trim($"text"))))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc_id", $"h")
      .orderBy($"doc_id")
  }

  /** L2 — MinHash+LSH near-dedup, keep-first: shingle(3-word) → binary
    * hashing-TF → MinHash signatures → LSH bucket join → candidate pairs
    * under Jaccard distance 0.3 → drop the higher doc_id of each pair.
    * Output = surviving doc ids. No oracle (LSH is approximate); DedupSpec
    * asserts exact duplicates are always caught and survivors ⊆ input.
    */
  private def dedupMinhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val shingled = docs
      .withColumn("w", split(trim($"text"), " "))
      .withColumn("shingles",
        when(size($"w") >= 3,
          expr("transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
          .otherwise($"w"))
      .filter(size($"shingles") > 0)
      .select($"doc_id", $"shingles")
    val tf = new HashingTF()
      .setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(shingled)
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("sig")
      .setNumHashTables(3).setSeed(42L)
    val model = lsh.fit(feat)
    // transform once and cache: approxSimilarityJoin would otherwise
    // recompute TF+MinHash signatures for BOTH sides of the self-join
    val sigs = model.transform(feat).cache()
    val pairs = model.approxSimilarityJoin(sigs, sigs, 0.3, "dist")
      .select(
        col("datasetA.doc_id").as("a_id"),
        col("datasetB.doc_id").as("b_id"))
      .filter($"a_id" < $"b_id")
    val dupIds = pairs.select($"b_id".as("doc_id")).distinct()
    docs.join(dupIds, Seq("doc_id"), "left_anti")
      .select($"doc_id")
      .orderBy($"doc_id")
  }

  /** North-star — 32-bit SimHash signature per document, computed fully
    * inside whole-stage codegen (token hashes once, then a per-bit fold).
    * No oracle (xxhash64 is Spark-specific); DedupSpec asserts the
    * identical-text and near-text properties.
    */
  private def dedupSimhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("hs", expr("transform(split(trim(text), ' '), x -> xxhash64(x))"))
      .withColumn("bitsums", expr(
        """transform(sequence(0, 31),
          |  i -> aggregate(hs, 0, (acc, h) -> acc + IF((shiftright(h, i) & 1) = 1, 1, -1)))""".stripMargin))
      .withColumn("simhash", expr(
        """aggregate(sequence(31, 0, -1), CAST(0 AS BIGINT),
          |  (acc, i) -> acc * 2 + IF(element_at(bitsums, i + 1) >= 0,
          |                           CAST(1 AS BIGINT), CAST(0 AS BIGINT)))""".stripMargin))
      .select($"doc_id", $"simhash")
      .orderBy($"doc_id")
  }

  /** North-star — word-3-gram Jaccard similarity scoring: for each doc in a
    * bounded slice, the best Jaccard score against any other doc in the
    * slice. Exact all-pairs is deliberately bounded (doc_id < 300) — the
    * unbounded path is [[dedupMinhash]]; this is the exact scorer you run
    * on LSH candidates. */
  private def dedupNgramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val grams = Tables.documents(spark, sfDir)
      .filter($"doc_id" < 300)
      .withColumn("w", split(trim($"text"), " "))
      .withColumn("g",
        when(size($"w") >= 3,
          expr("transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
          .otherwise($"w"))
      .select($"doc_id", array_distinct($"g").as("g"))
    val a = grams.select($"doc_id".as("a_id"), $"g".as("ga"))
    val b = grams.select($"doc_id".as("b_id"), $"g".as("gb"))
    a.join(b, $"a_id" < $"b_id")
      .withColumn("j",
        size(array_intersect($"ga", $"gb")) /
          nullif(size(array_union($"ga", $"gb")), lit(0)))
      .groupBy($"a_id")
      .agg(pround(max($"j"), 6).as("best_j"))
      .orderBy($"a_id")
  }

  /** North-star — embedding-cosine near-dedup, keep-first: drop the higher
    * vec_id of every label-blocked pair with cosine ≥ 0.9. Output =
    * surviving vec ids. The exact twin of [[dedupMinhash]] for the
    * embedding modality; at 100 TB the pair source is LSH candidates
    * ([[Similarity]] signatures), not the blocked cross join. */
  private def dedupEmbedCosine(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.VecDotNative.{vec_dot_native, vec_norm_native}
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("nrm", vec_norm_native($"embedding"))
    val a = e.select($"vec_id".as("a_id"), $"label".as("a_label"),
      $"embedding".as("va"), $"nrm".as("na"))
    val b = e.select($"vec_id".as("b_id"), $"label".as("b_label"),
      $"embedding".as("vb"), $"nrm".as("nb"))
    val dups = a.join(b, $"a_label" === $"b_label" && $"a_id" < $"b_id")
      .filter(vec_dot_native($"va", $"vb") / ($"na" * $"nb") >= 0.9)
      .select($"b_id".as("vec_id")).distinct()
    e.join(dups, Seq("vec_id"), "left_anti")
      .select($"vec_id")
      .orderBy($"vec_id")
  }

  override def queries: Map[String, QueryFn] = Map(
    "dedup_exact_id"      -> dedupExactId,
    "dedup_text_hash"     -> dedupTextHash,
    "dedup_minhash"       -> dedupMinhash,
    "dedup_simhash"       -> dedupSimhash,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_embed_cosine"  -> dedupEmbedCosine
  )

  override def oracles: Map[String, String] = Map(
    "dedup_exact_id" ->
      """SELECT DISTINCT event_id, event_type, user_id FROM (
        |  SELECT event_id, event_type, user_id FROM events
        |  UNION ALL
        |  SELECT event_id, event_type, user_id FROM events)
        |ORDER BY event_id""".stripMargin,
    "dedup_text_hash" ->
      """SELECT doc_id, h FROM (
        |  SELECT doc_id, md5(lower(trim(text))) AS h,
        |         row_number() OVER (PARTITION BY md5(lower(trim(text)))
        |                            ORDER BY doc_id ASC) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "dedup_embed_cosine" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |dups AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.v, b.v) /
        |        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.9)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT vec_id FROM dups)
        |ORDER BY vec_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH grams AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(w) >= 3
        |         THEN list_transform(range(len(w) - 2),
        |                             i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
        |         ELSE w END) AS g
        |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w
        |        FROM documents WHERE doc_id < 300))
        |SELECT a.doc_id AS a_id,
        |       floor(max(len(list_intersect(a.g, b.g)) * 1.0 /
        |                 nullif(len(list_distinct(a.g || b.g)), 0)) * 1000000 + 0.5) / 1000000 AS best_j
        |FROM grams a JOIN grams b ON a.doc_id < b.doc_id
        |GROUP BY a.doc_id ORDER BY a_id""".stripMargin
  )
}
