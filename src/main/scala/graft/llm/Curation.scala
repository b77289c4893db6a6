package graft.llm

import graft.{QueryModule, Tables}
import graft.functions.PortableRound.pround
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data curation operators (SURVEY.md §2.11 north-star extensions):
  * the per-document preprocessing a large-scale LLM data pipeline applies
  * between raw ingest and tokenization — deterministic sampling, windowed
  * chunking, PII masking, composite quality filtering, and containment
  * scoring.
  *
  * Reference lineage: the reference curates raw events into clean
  * partitioned tables before analytics (`glue/job_wiki_curate.py:32-51`);
  * these operators are the document-modality equivalent of that
  * curate-before-query stage.
  *
  * Scale notes (100 TB): every operator here except the bounded containment
  * scorer is a pure MAP — no shuffle at all. That is deliberate: sampling,
  * chunking, masking, and quality filtering are the operations that touch
  * EVERY byte of a corpus, so at 100 TB they must stream through the scan
  * (filter/project pushed into the parquet reader, whole-stage codegen, no
  * exchange). The orderBy each query ends with exists only for the
  * determinism contract at test scale — a production pipeline writes the
  * map output straight back out, partition-parallel.
  */
object Curation extends QueryModule {

  /** Deterministic HASH-based stratified sampling — the 100-TB way to
    * downsample a majority class (here: language rebalancing, the standard
    * LLM-corpus move). Each doc maps to a uniform [0,1) draw via the first
    * 8 md5 hex digits of its id — no RNG state, no seed plumbing, fully
    * reproducible across engines and re-runs, and embarrassingly parallel
    * (a pure map-side filter; `sampleBy` needs a seeded partition RNG and
    * is not replayable cross-engine). Keep-rates: en 0.25 (majority class
    * downsampled 4x), de 0.5, everything else kept. */
  /** Neyman-allocation design for stratified sampling (Neyman 1934):
    * given a 1000-row sample budget over the event_type strata, allocate
    * n_h ∝ N_h·S_h — more rows to big AND noisy strata — the
    * variance-optimal design every serious estimation sample uses instead
    * of proportional allocation ([[sampleStratifiedHash]] is the
    * fixed-fraction cousin; compose this table with [[sampleGroupCap]]'s
    * rank machinery to materialize the rows).
    *
    * Determinism (the hard part): S_h must be IDENTICAL cross-engine
    * before the allocation rounds, and streaming stddev of doubles is
    * summation-order-dependent — so values micro-quantize to 1e-4 units
    * first, the variance comes from the exact integer moments
    * (n·Σv² − (Σv)², in 38-digit decimals — BIGINT·BIGINT overflows at
    * ~2k rows already), and every engine converts the same exact integer
    * to the same double. Scale shape (100 TB): one partial+final pass to
    * |strata| moment cells; the allocation math runs on those cells. */
  private def sampleNeymanAlloc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val budget = 1000L
    val stats = Tables.events(spark, sfDir)
      .select($"event_type", floor($"value" * 1e4 + 0.5).cast("long").as("q"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_h"), sum($"q").as("sv"), sum($"q" * $"q").as("sq"))
      .withColumn("s2",
        ($"n_h".cast("decimal(38,0)") * $"sq".cast("decimal(38,0)") -
          $"sv".cast("decimal(38,0)") * $"sv".cast("decimal(38,0)")).cast("double") /
          ($"n_h".cast("double") * ($"n_h" - 1).cast("double")))
      .withColumn("wq", floor($"n_h" * sqrt($"s2") + 0.5).cast("long"))
    val w = stats.agg(sum($"wq").as("wsum"))
    stats.crossJoin(broadcast(w))
      .select($"event_type", $"n_h",
        pround(sqrt($"s2") / 1e4, 4).as("sd"),
        floor(lit(budget.toDouble) * $"wq" / $"wsum" + 0.5).cast("long").as("alloc"))
      .orderBy($"event_type")
  }

  private def sampleStratifiedHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val u = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)
    Tables.documents(spark, sfDir)
      .filter(u < when($"lang" === "en", 0.25)
        .when($"lang" === "de", 0.5).otherwise(1.0))
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }

  private val ChunkTokens = 50
  private val ChunkStride = 40

  /** Fixed-token-window chunking with overlap (window 50, stride 40 — the
    * 10-token overlap preserves context across chunk boundaries, the
    * standard pre-tokenization split for embedding/pretraining pipelines).
    * Chunk starts explode map-side from a `sequence`; each chunk is a
    * `slice` + `concat_ws` of the pre-split token array — no shuffle, no
    * window function, the doc's tokens are read once per chunk from the
    * row-local array. */
  private def textChunk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", split(trim($"text"), " ").as("ws"))
      .select($"doc_id", $"ws", size($"ws").as("nw"))
      .select($"doc_id", $"ws",
        explode(sequence(lit(0), $"nw" - 1, lit(ChunkStride))).as("start"))
      .select(
        $"doc_id",
        floor($"start" / lit(ChunkStride)).cast("long").as("chunk_id"),
        concat_ws(" ", slice($"ws", $"start" + 1, lit(ChunkTokens))).as("chunk"),
        size(slice($"ws", $"start" + 1, lit(ChunkTokens))).cast("long").as("n_tokens"))
      .orderBy($"doc_id", $"chunk_id")
  }

  /** PII masking — emails then long digit/dash runs replaced with typed
    * placeholder tokens, the minimum-viable scrub every public-corpus
    * pipeline runs. Both patterns restrict to regex constructs Java
    * (Spark) and RE2 (DuckDB) interpret identically — character classes,
    * bounded repetition — so the oracle replays the masking exactly.
    * Single codegen'd projection, no shuffle. */
  private val EmailRe = "[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}"
  private val NumRe = "[0-9][0-9\\-]{2,}[0-9]"

  private def textPiiMask(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        regexp_replace(
          regexp_replace($"text", EmailRe, "<EMAIL>"),
          NumRe, "<NUM>").as("masked"))
      .withColumn("n_chars", length($"masked").cast("long"))
      .orderBy($"doc_id")
  }

  /** Composite C4-style quality filter: length bounds, minimum token
    * count, mean-word-length band, digit-density cap — each emitted as its
    * own flag (pipelines track per-rule rejection rates) plus the combined
    * keep decision. All thresholds compare in INTEGER arithmetic
    * (`10·digits < 3·len` instead of `digits/len < 0.3`) so no float ever
    * sits on a decision boundary — bit-identical in any engine. One
    * codegen'd pass over the scan, no shuffle. */
  /** The four quality conditions over a text column — shared by the batch
    * query, the composed pipeline, and the streaming curate-on-ingest
    * parity test (StreamingSpec): a pure column expression works unchanged
    * under `readStream`, which is the whole stream/batch-unification
    * point. */
  def qualityFlags(text: Column): (Column, Column, Column, Column) = {
    val len = length(text)
    val ntok = size(split(trim(text), " "))
    val letters = length(regexp_replace(text, " ", ""))
    val digits = len - length(regexp_replace(text, "[0-9]", ""))
    (len >= 60 && len <= 520,
      ntok >= 15,
      letters >= ntok * 2 && letters <= ntok * 12,
      digits * 10 < len * 3)
  }

  /** Conjunction of [[qualityFlags]] — the keep decision. */
  def qualityKeep(text: Column): Column = {
    val (lenOk, tokOk, wordOk, digitOk) = qualityFlags(text)
    lenOk && tokOk && wordOk && digitOk
  }

  private def qualityFilterPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (lenOk, tokOk, wordOk, digitOk) = qualityFlags($"text")
    Tables.documents(spark, sfDir)
      .select(
        $"doc_id",
        lenOk.as("len_ok"),
        tokOk.as("tok_ok"),
        wordOk.as("wordlen_ok"),
        digitOk.as("digit_ok"))
      .withColumn("keep",
        $"len_ok" && $"tok_ok" && $"wordlen_ok" && $"digit_ok")
      .orderBy($"doc_id")
  }

  /** Per-group cap (at most N docs per language), selected in
    * deterministic hash order — corpus balancing when a proportional rate
    * isn't enough and a hard per-class budget is required. Selection key =
    * md5 of the id: reproducible across engines/runs and uncorrelated with
    * any data attribute (ordering by doc_id would bias toward early
    * crawl). One shuffle on (lang) + per-group sort for the rank.
    * Scale note: partition-by-language is skewed at corpus scale (a
    * handful of giant groups); the production form two-phases it — the
    * [[sampleStratifiedHash]] rate filter with rate = N/count(lang) as a
    * pre-cap (map-side, cuts each group to ~N±√N), THEN this exact
    * rank-cap over the tiny survivor set. The declared query keeps the
    * exact single-pass form the two-phase version must agree with. */
  private val GroupCap = 60

  private def sampleGroupCap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang")
      .orderBy(md5($"doc_id".cast("string")).asc, $"doc_id".asc)
    Tables.documents(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= GroupCap)
      .select($"doc_id", $"lang", $"rk".cast("long").as("rk"))
      .orderBy($"doc_id")
  }

  /** Containment scoring — max over other docs of |A∩B| / |A| on 3-gram
    * shingle sets. Containment (not Jaccard) is what catches a document
    * EMBEDDED inside a larger one (boilerplate wrapping, quote-and-extend
    * dups) where Jaccard dilutes below threshold. Asymmetric, so pairs are
    * a != b, not a < b. Exact scorer on the bounded slice — the unbounded
    * candidate source is the minhash band join ([[Dedup.minhashDupPairs]]),
    * exactly as with `dedup_ngram_jaccard`. */
  private def dedupContainment(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val grams = Tables.documents(spark, sfDir)
      .filter($"doc_id" < 300)
      .withColumn("w", split(trim($"text"), " "))
      .withColumn("g",
        when(size($"w") >= 3,
          expr("transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
          .otherwise($"w"))
      .select($"doc_id", array_distinct($"g").as("g"))
    val a = grams.repartition(col("doc_id"))
      .select($"doc_id".as("a_id"), $"g".as("ga"))
    val b = grams.select($"doc_id".as("b_id"), $"g".as("gb"))
    a.join(broadcast(b), $"a_id" =!= $"b_id")
      .withColumn("c",
        size(array_intersect($"ga", $"gb")) / nullif(size($"ga"), lit(0)))
      .groupBy($"a_id")
      .agg(pround(max($"c"), 6).as("best_containment"))
      .orderBy($"a_id")
  }

  /** Target mix shares for [[sampleDomainMix]] — the declared corpus
    * composition (the knob a pretraining run publishes, e.g. Llama/Pile
    * domain weights). Must sum to 1. */
  private val MixTargets: Seq[(String, Double)] =
    Seq("en" -> 0.40, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15)

  /** Domain-mix resampling — downsample each domain so the KEPT corpus
    * matches declared target proportions (the composition step every
    * pretraining data recipe runs after cleaning). Water-filling: the
    * largest kept corpus honoring shares p_l with supplies n_l is
    * T = min_l(n_l / p_l); each domain then keeps f_l = p_l·T / n_l of its
    * docs (f = 1 exactly for the binding domain — nothing is upsampled).
    *
    * Scale shape: one tiny partial-aggregated groupBy(lang) for the
    * supplies, the min over it attached as a broadcast scalar, the per-lang
    * fractions broadcast back onto the corpus scan, and the draw itself is
    * the same stateless md5-uniform as [[sampleStratifiedHash]] — so the
    * kept set is a deterministic map-side filter, replayable cross-engine
    * and independent of partitioning. No collect, no window, no full-corpus
    * shuffle. `least(1.0, ·)` guards the binding domain's f against the
    * one-ulp float excess (n/p·p/n can round to 1.0000…02 — both engines
    * compute the identical IEEE value, but >1 draws are impossible, so the
    * clamp documents intent rather than papering over divergence). */
  private def sampleDomainMix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val pCol = MixTargets.tail.foldLeft(
      when($"lang" === MixTargets.head._1, MixTargets.head._2)) {
      case (acc, (l, p)) => acc.when($"lang" === l, p)
    }
    val supplies = docs.groupBy($"lang").agg(count(lit(1)).as("n_l"))
      .withColumn("p", pCol)
      .filter($"p".isNotNull)
    // t_max via an unpartitioned window over the DOMAIN-COUNT rows (one per
    // domain, a handful) — NOT a second aggregation, which would re-scan
    // the corpus for the same 5 rows. The single-partition window is safe
    // exactly because its input is domain-cardinality, never corpus-sized.
    val fracs = supplies
      .withColumn("t_max", min($"n_l" / $"p").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select($"lang", least(lit(1.0), $"p" * $"t_max" / $"n_l").as("f"))
    val u = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)
    docs.join(broadcast(fracs), Seq("lang"))
      .filter(u < $"f")
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }

  /** Temperature-based language rebalancing (the XLM-R / mBERT exponential
    * smoothing, Conneau et al. 2020): target share q_l ∝ (n_l/N)^α with
    * α = 0.7 — low-resource languages are upsampled relative to their raw
    * share without letting any single language dominate. The realized
    * sample keeps every doc of the most-suppressed language (rate 1) and
    * scales the rest to match the q ratios — the same water-filling closure
    * as [[sampleDomainMix]] with temperature-derived targets. All the
    * per-language arithmetic happens on the language-cardinality count rows
    * (a handful); the draw is the stateless md5 map-side filter. `pow` is
    * not bit-specified by IEEE, but both engines agree to <1 ulp and the
    * draw grid is 2^-32, so a boundary flip needs a q within ~1e-16 of a
    * grid point — negligible, and the clamp bounds rates at 1 anyway. */
  private def sampleTemperature(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n_l"))
    val win = org.apache.spark.sql.expressions.Window.partitionBy()
    // All on language-count rows: shares, smoothed targets, then the
    // water-filling scale that pins the binding language at rate 1.
    val rates = counts
      .withColumn("n", sum($"n_l").over(win))
      .withColumn("q_raw", pow($"n_l" / $"n", lit(0.7)))
      .withColumn("q", $"q_raw" / sum($"q_raw").over(win))
      .withColumn("t_max", min($"n_l" / $"q").over(win))
      .select($"lang", least(lit(1.0), $"q" * $"t_max" / $"n_l").as("f"))
    val u = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)
    docs.join(broadcast(rates), Seq("lang"))
      .filter(u < $"f")
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * each doc draws u ∈ (0,1) and keys on -ln(u)/w — the k smallest keys
    * are a weighted sample without replacement, here weighted by document
    * length (the standard long-doc upweighting when assembling a token
    * budget). One pass, no RNG state: u is the same stateless md5-uniform
    * as [[sampleStratifiedHash]] (a zero draw — p = 2⁻³² per doc — maps
    * to key +∞ in both engines and is simply never sampled), and the
    * global top-k is
    * `TakeOrderedAndProject` (per-task heaps), never a full sort. The
    * rank key uses ln — not bit-specified by IEEE, but both engines agree
    * to <1 ulp and ranks only flip on near-exact key ties, impossible
    * with distinct md5 draws at this precision; the REPORTED key rounds
    * portably. */
  private def sampleWeighted(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val u = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)
    Tables.documents(spark, sfDir)
      .withColumn("key", -log(u) / $"n_chars")
      .orderBy($"key".asc, $"doc_id".asc)
      .limit(100)
      .select($"doc_id", $"n_chars", pround($"key" * 1000, 6).as("k1000"))
      .orderBy($"doc_id")
  }

  /** GPT-style sequence packing: concatenate the corpus in a deterministic
    * order (doc_id) and split into fixed-capacity context windows — each doc
    * is assigned the window its FIRST token lands in. The core primitive is
    * a global prefix sum of token counts, computed by the two-phase
    * distributed form ([[graft.rel.ScalableRank.withGlobalRunningSum]]):
    * range shuffle + per-partition sums + tiny offset window + local cumsum.
    * A naive `sum over (order by doc_id)` window moves the whole corpus to
    * ONE partition — the single-partition trap this module's scaladoc bans;
    * here the only global window runs over ≤ shuffle.partitions partial
    * sums. Capacity 2048 whitespace tokens. */
  private def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cap = 2048L
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id",
        size(filter(split(trim($"text"), " "), t => t =!= ""))
          .cast("long").as("n_tok"))
    graft.rel.ScalableRank
      .withGlobalRunningSum(docs, $"n_tok", "cum", $"doc_id")
      .select($"doc_id", $"n_tok",
        floor(($"cum" - $"n_tok") / cap).as("chunk"))
      .orderBy($"doc_id")
  }

  /** Quality-ordered token-budget selection: fill a fixed training-token
    * budget with the best documents first — the "assemble a 1B-token mix
    * from the top of the quality ranking" step that closes every curation
    * pipeline (the budgeted counterpart of [[sampleTemperature]]'s
    * proportional mix). Quality proxy here is mean chars-per-token
    * (Gopher's mean-word-length signal, deterministic and engine-portable);
    * a doc is kept iff its FIRST token lands inside the budget (the
    * [[packSequences]] boundary convention, so exactly one doc straddles
    * the cut). Budget: 10k tokens.
    *
    * Scale shape (100 TB): the corpus collapses to one slim
    * (doc_id, n_tok, score) row per doc in a single map pass; the prefix
    * sum over the quality order is the two-phase distributed form
    * ([[graft.rel.ScalableRank.withGlobalRunningSum]] — range shuffle +
    * per-partition sums + a window over ≤ shuffle.partitions partial
    * sums), NEVER a single-partition `sum over (order by score)` window.
    * Selection is then a map-side filter on the cumsum. */
  private def tokenBudget(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val budget = 10000L
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"n_chars",
        size(filter(split(trim($"text"), " "), t => t =!= ""))
          .cast("long").as("n_tok"))
      .filter($"n_tok" > 0)
      .withColumn("score", pround($"n_chars".cast("double") / $"n_tok", 4))
      .select($"doc_id", $"n_tok", $"score")
    graft.rel.ScalableRank
      .withGlobalRunningSum(docs, $"n_tok", "cum", $"score".desc, $"doc_id".asc)
      .filter($"cum" - $"n_tok" < budget)
      .select($"doc_id", $"score", $"n_tok", $"cum")
      .orderBy($"doc_id")
  }

  /** The survivors of the full curation DAG, stage by stage — the
    * composition every component in this module exists for (and the
    * document-modality analog of the reference's curate job,
    * `glue/job_wiki_curate.py`):
    *
    *   raw → repetition filter (Gopher dup-3-gram criterion; the
    *   dup-WORD criterion is deliberately not composed here — on a small
    *   vocabulary it measures the vocabulary, not the document) →
    *   quality filter (the `quality_filter_pipeline` length/token/
    *   word-shape/digit conditions) → exact dedup keep-first on the
    *   normalized-text hash (the `dedup_text_hash` key) → domain-mix
    *   water-filling resample RECOMPUTED over the surviving corpus.
    *
    * Plan shape: the corpus is read ONCE — a single codegen'd projection
    * evaluates both filter stages into boolean FLAGS (the tokenization and
    * 3-gram arrays are shared subexpressions inside one Project, computed
    * once per row) plus the dedup hash, and that slim text-free frame is
    * what materializes. Every stage count, the dedup window, the supplies
    * aggregate, and the mix join all derive from it, so the expensive text
    * pass never re-runs (the first funnel cut re-ran it per stage branch —
    * 8.3 s steady at sf0.1; flags form: one pass). End-to-end the DAG is
    * still ≤2 corpus-key shuffles (hash window + supplies agg; mix attaches
    * by broadcast) regardless of corpus size. */
  private def keptAfterStages(spark: SparkSession, sfDir: String): (DataFrame, Seq[(String, DataFrame)]) = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val w = filter(split(trim($"text"), " "), t => t =!= "")
    val g3 = when(size($"w") >= 3,
      transform(sequence(lit(1), size($"w") - 2), i =>
        concat_ws(" ", element_at($"w", i), element_at($"w", i + 1),
          element_at($"w", i + 2))))
      .otherwise(array().cast("array<string>"))
    val l = length($"text")
    val ntok = size($"w")
    val letters = length(regexp_replace($"text", " ", ""))
    val digits = l - length(regexp_replace($"text", "[0-9]", ""))
    // One pass over the corpus: both stage flags + the dedup hash, then
    // the text drops. This is the frame that materializes — at corpus
    // scale it is a fixed ~50 bytes/doc regardless of document length.
    val flags = graft.rel.Materialize.once(docs
      .withColumn("w", w).withColumn("g3", g3)
      .withColumn("nonrep_ok",
        !((size($"g3") - size(array_distinct($"g3"))) * 100 >
          size($"g3") * 18))
      .withColumn("q_ok", $"nonrep_ok" &&
        l >= 60 && l <= 520 && ntok >= 15 &&
        letters >= ntok * 2 && letters <= ntok * 12 &&
        digits * 10 < l * 3)
      .select($"doc_id", $"lang", $"nonrep_ok", $"q_ok",
        md5(lower(trim($"text"))).as("h")))
    val nonRep = flags.filter($"nonrep_ok")
    val quality = flags.filter($"q_ok")
    // Also pinned: the deduped survivors feed BOTH the supplies aggregate
    // and the mix join — one window execution, not two. In a production
    // DAG this is where the cleaned corpus persists between stages anyway.
    val deduped = graft.rel.Materialize.once(quality
      .withColumn("rep", min($"doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"h")))
      .filter($"doc_id" === $"rep").drop("rep"))
    val pCol = MixTargets.tail.foldLeft(
      when($"lang" === MixTargets.head._1, MixTargets.head._2)) {
      case (acc, (lg, p)) => acc.when($"lang" === lg, p)
    }
    val supplies = deduped.groupBy($"lang").agg(count(lit(1)).as("n_l"))
      .withColumn("p", pCol).filter($"p".isNotNull)
    val fracs = supplies
      .withColumn("t_max", min($"n_l" / $"p").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select($"lang", least(lit(1.0), $"p" * $"t_max" / $"n_l").as("f"))
    val u = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)
    val mixed = deduped.join(broadcast(fracs), Seq("lang")).filter(u < $"f")
    (mixed,
      Seq("raw" -> flags, "nonrepetitive" -> nonRep, "quality" -> quality,
        "deduped" -> deduped, "mixed" -> mixed))
  }

  private def curationPipelineE2e(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    keptAfterStages(spark, sfDir)._1
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }

  /** Stage-by-stage survivor counts of [[curationPipelineE2e]] — the
    * funnel the reference dashboards as a QuickSight funnel chart
    * (BASELINE.md top-25-vs-Other). One row per stage, fixed order. */
  private def curationFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (_, stages) = keptAfterStages(spark, sfDir)
    stages.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("n"))
        .select(lit(i.toLong).as("stage"), lit(name).as("name"), $"n")
    }.reduce(_ unionByName _).orderBy($"stage")
  }

  /** Training shards to balance into. */
  private val ShardCount = 8

  /** Token-balanced shard assignment — the last step before a training
    * run: distribute documents over N shards so every shard carries a
    * near-equal TOKEN load (data-parallel workers step in lockstep; a fat
    * shard stalls the whole step). Longest-processing-time round-robin:
    * rank docs by token count descending, shard = (rank−1) mod N — the
    * classic LPT makespan approximation, and on a 500-doc corpus the
    * loads land within ~1% (asserted in QualityLayoutSpec).
    *
    * Scale shape: the only global structure is the rank, computed by the
    * two-phase distributed row-number ([[graft.rel.ScalableRank]]) —
    * range shuffle + per-partition counts + a window over
    * ≤ shuffle.partitions offset rows. NO single-partition window over
    * the corpus. The physical write would follow as
    * `.repartition(col("shard")).write` — shard-local files, one pass. */
  private def shardBalance(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id",
        size(expr("filter(split(trim(text), ' '), x -> x <> '')"))
          .cast("long").as("n_tokens"))
    graft.rel.ScalableRank
      .withGlobalRowNumber(toks, "rn", "n", $"n_tokens".desc, $"doc_id".asc)
      .withColumn("shard", ($"rn" - 1) % ShardCount)
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("total_tokens"))
      .orderBy($"shard")
  }

  /** Deterministic train/val/test SPLIT — the canonical last step before a
    * corpus ships to training: every doc lands in exactly one of
    * train (90%) / val (5%) / test (5%) by the same stateless md5-uniform
    * as [[sampleStratifiedHash]], so the assignment is reproducible across
    * engines, re-runs, and INCREMENTAL ingests (a doc's split never changes
    * when new data arrives — the property a seeded `randomSplit` cannot
    * give, since its assignment depends on partition layout). Reported as
    * per-split per-lang doc and char counts — the split manifest a
    * pipeline records next to the shards.
    *
    * Scale shape (100 TB): the assignment is a pure map over the scan; the
    * only shuffle carries split×lang cells (≤15 rows) through a partial
    * aggregate. */
  private def sampleSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val u = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)
    Tables.documents(spark, sfDir)
      .select($"lang", $"n_chars",
        when(u < 0.90, "train").when(u < 0.95, "val").otherwise("test")
          .as("split"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"))
      .orderBy($"split", $"lang")
  }

  /** Quality-aware dedup survivor selection — exact-duplicate clusters
    * (normalized-text hash, the `dedup_text_hash` key) keep their
    * HIGHEST-QUALITY member instead of the lowest id: real pipelines keep
    * the best-formatted copy of a duplicated page, not an arbitrary one.
    * Quality is the INTEGER count of satisfied [[qualityFlags]] (0–4) —
    * integer scoring keeps the argmax bit-identical cross-engine (no float
    * ever sits on the keep/drop boundary); ties break on lowest doc_id.
    * Output: each surviving doc with its score and its cluster's size.
    *
    * Scale shape (100 TB): ONE corpus-key shuffle — the hash-partition
    * window that ranks within clusters (score and hash both compute
    * map-side in the same scan pass); no join, no second pass. */
  private def curationKeepBest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val (lenOk, tokOk, wordOk, digitOk) = qualityFlags($"text")
    val score = (lenOk.cast("int") + tokOk.cast("int") +
      wordOk.cast("int") + digitOk.cast("int")).cast("long")
    val w = Window.partitionBy($"h")
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", score.as("q_score"),
        md5(lower(trim($"text"))).as("h"))
      .withColumn("n_dups", count(lit(1)).over(w).cast("long"))
      .withColumn("rn", row_number().over(
        w.orderBy($"q_score".desc, $"doc_id".asc)))
      .filter($"rn" === 1)
      .select($"doc_id", $"lang", $"q_score", $"n_dups")
      .orderBy($"doc_id")
  }

  private val DsirBuckets = 8192

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw document
    * by how target-like it is, as the log-likelihood ratio of two hashed
    * n-gram bag-of-words models — here target = the `en` slice (stand-in
    * for "high-quality domain"), raw = the whole corpus. Hashed uni+bigrams
    * land in 8192 buckets (`md5`-derived, the repo's cross-engine hash);
    * each bucket's add-one-smoothed log ratio
    * `ln((ct_t+1)(R+B) / ((ct_r+1)(T+B)))` is rounded ONCE to integer
    * micro-nats in the bucket DIMENSION, and each document sums those
    * BIGINT micros — integer summation makes the per-doc weight
    * bit-identical across engines regardless of addition order (the
    * float-determinism trap the avg-based scores dodge by rounding last).
    * Downstream, `log_w_micro` is exactly what [[sampleWeighted]]-style
    * resampling consumes (DSIR = weight, then importance-resample).
    *
    * Scale shape (100 TB): gram explosion is a pure map (zip_with over the
    * token array — no per-doc window, no shuffle); bucket stats partial-
    * aggregate to ≤8192 rows/partition and the corpus totals FOLD from the
    * bucket stats (no gram pass of their own); the scored pass broadcast-
    * joins the 8192-row dimension, and the per-doc sum combines map-side
    * (grams of a doc are co-located by construction), so one row per doc
    * crosses the wire. Two passes over the gram stream, zero wide
    * shuffles of it. */
  private def dsirWeights(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val B = DsirBuckets
    val d = Tables.documentsSpread(spark, sfDir)
      .select($"doc_id", $"lang", split(trim($"text"), " ").as("ts"))
    val uni = d.select($"doc_id", $"lang", explode($"ts").as("g"))
    val bi = d.select($"doc_id", $"lang", explode(expr(
        """zip_with(slice(ts, 1, greatest(size(ts) - 1, 0)),
          |         slice(ts, 2, greatest(size(ts) - 1, 0)),
          |         (a, b) -> concat(a, ' ', b))""".stripMargin)).as("g"))
    val grams = uni.unionByName(bi)
      .withColumn("b",
        conv(substring(md5($"g"), 1, 8), 16, 10).cast("long") % B)
    // TWO passes over the gram stream instead of three (guide §2.3): the
    // corpus totals fold from the ≤8192-row bucket stats (r = Σ ct_r,
    // t = Σ ct_t — the same integers the dropped third gram pass
    // counted), so only the bucket stats and the scored pass touch the
    // gram stream. Both remaining passes partial-aggregate map-side
    // straight to bounded frames (≤8192 buckets; one row per doc) — a
    // (doc, bucket) pre-aggregation was tried and REJECTED: per-doc
    // buckets are nearly unique, so the cell frame is gram-sized and its
    // exchange costs more than the saved map pass (IsoBench 1.70→1.90).
    val stats = grams.groupBy($"b").agg(
      count(lit(1)).as("ct_r"),
      count(when($"lang" === "en", 1)).as("ct_t"))
    // coalesce(…, 0): on an EMPTY gram stream sum() is NULL where the old
    // third gram pass counted 0 — a NULL r/t would NULL-poison the log()
    // scores (round-15 advice; degenerate input only, fixtures non-empty).
    val tot = stats.agg(
      coalesce(sum($"ct_r"), lit(0L)).as("r"),
      coalesce(sum($"ct_t"), lit(0L)).as("t"))
    val dim = stats.crossJoin(broadcast(tot))
      .select($"b", floor(log(
          ($"ct_t" + 1.0) * ($"r" + B) / (($"ct_r" + 1.0) * ($"t" + B)))
          * 1e6 + 0.5).cast("long").as("lr_micro"))
    grams.join(broadcast(dim), Seq("b"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"), sum($"lr_micro").as("log_w_micro"))
      .orderBy($"doc_id")
  }

  override def queries: Map[String, QueryFn] = Map(
    "curation_dsir"           -> dsirWeights,
    "curation_shard_balance"  -> shardBalance,
    "curation_pipeline_e2e"   -> curationPipelineE2e,
    "curation_funnel"         -> curationFunnel,
    "curation_pack_sequences" -> packSequences,
    "curation_token_budget"   -> tokenBudget,
    "sample_weighted"         -> sampleWeighted,
    "sample_temperature"      -> sampleTemperature,
    "sample_domain_mix"       -> sampleDomainMix,
    "sample_stratified_hash"  -> sampleStratifiedHash,
    "sample_neyman_alloc"     -> sampleNeymanAlloc,
    "sample_split"            -> sampleSplit,
    "curation_keep_best"      -> curationKeepBest,
    "text_chunk"              -> textChunk,
    "text_pii_mask"           -> textPiiMask,
    "quality_filter_pipeline" -> qualityFilterPipeline,
    "sample_group_cap"        -> sampleGroupCap,
    "dedup_containment"       -> dedupContainment
  )

  /** The curation DAG as shared CTEs ending in `mixed` — prefix of the
    * e2e and funnel oracles so both provably replay the same stages. */
  private val PipelineCtes: String =
    """WITH w0 AS (
      |  SELECT doc_id, lang, text,
      |         list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
      |  FROM documents),
      |g AS (
      |  SELECT *, CASE WHEN len(w) >= 3
      |    THEN list_transform(range(1, len(w) - 1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
      |    ELSE []::VARCHAR[] END AS g3
      |  FROM w0),
      |nonrep AS (
      |  SELECT doc_id, lang, text, w FROM g
      |  WHERE NOT ((len(g3) - len(list_distinct(g3))) * 100 > len(g3) * 18)),
      |quality AS (
      |  SELECT doc_id, lang, text FROM nonrep
      |  WHERE len(text) >= 60 AND len(text) <= 520 AND len(w) >= 15
      |    AND len(replace(text, ' ', '')) >= len(w) * 2
      |    AND len(replace(text, ' ', '')) <= len(w) * 12
      |    AND (len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))) * 10
      |        < len(text) * 3),
      |dedup AS (
      |  SELECT doc_id, lang FROM (
      |    SELECT doc_id, lang,
      |           min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS rep
      |    FROM quality) WHERE doc_id = rep),
      |c AS (SELECT lang, count(*) AS n_l FROM dedup GROUP BY lang),
      |p AS (
      |  SELECT lang, n_l,
      |    CASE lang WHEN 'en' THEN CAST(0.40 AS DOUBLE)
      |              WHEN 'de' THEN CAST(0.15 AS DOUBLE)
      |              WHEN 'es' THEN CAST(0.15 AS DOUBLE)
      |              WHEN 'fr' THEN CAST(0.15 AS DOUBLE)
      |              WHEN 'zh' THEN CAST(0.15 AS DOUBLE) END AS p
      |  FROM c WHERE lang IN ('en','de','es','fr','zh')),
      |t AS (SELECT min(n_l / p) AS t_max FROM p),
      |f AS (SELECT lang, least(CAST(1.0 AS DOUBLE), p * t_max / n_l) AS f
      |      FROM p CROSS JOIN t),
      |mixed AS (
      |  SELECT d.doc_id, d.lang FROM dedup d JOIN f USING (lang)
      |  WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
      |          / 4294967296.0 < f)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "curation_dsir" ->
      s"""WITH d AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS ts FROM documents),
         |uni AS (SELECT doc_id, lang, unnest(ts) AS g FROM d),
         |bi AS (SELECT doc_id, lang, z.a || ' ' || z.b AS g
         |       FROM (SELECT doc_id, lang,
         |               unnest(list_zip(ts[1:-2], ts[2:-1])::STRUCT(a VARCHAR, b VARCHAR)[]) AS z
         |             FROM d)),
         |grams AS (
         |  SELECT doc_id, lang, ('0x' || substr(md5(g), 1, 8))::BIGINT % $DsirBuckets AS b
         |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
         |stats AS (SELECT b, count(*) AS ct_r,
         |                 count(*) FILTER (WHERE lang = 'en') AS ct_t
         |          FROM grams GROUP BY b),
         |tot AS (SELECT count(*) AS r, count(*) FILTER (WHERE lang = 'en') AS t FROM grams),
         |dim AS (SELECT b,
         |          CAST(floor(ln((ct_t + 1.0) * (r + $DsirBuckets) /
         |                        ((ct_r + 1.0) * (t + $DsirBuckets))) * 1e6 + 0.5) AS BIGINT)
         |            AS lr_micro
         |        FROM stats CROSS JOIN tot)
         |SELECT doc_id, count(*) AS n_grams,
         |       CAST(sum(lr_micro) AS BIGINT) AS log_w_micro
         |FROM grams JOIN dim USING (b)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "curation_shard_balance" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split(trim(text), ' '), x -> x <> ''))
         |      AS n_tokens
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, n_tokens,
         |    row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
         |  FROM t)
         |SELECT CAST((rn - 1) % $ShardCount AS BIGINT) AS shard,
         |  count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM r GROUP BY 1 ORDER BY shard""".stripMargin,
    "curation_pipeline_e2e" -> (PipelineCtes +
      """
        |SELECT doc_id, lang FROM mixed ORDER BY doc_id""".stripMargin),
    "curation_funnel" -> (PipelineCtes +
      """
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS name,
        |         count(*) AS n FROM documents
        |  UNION ALL SELECT 1, 'nonrepetitive', count(*) FROM nonrep
        |  UNION ALL SELECT 2, 'quality', count(*) FROM quality
        |  UNION ALL SELECT 3, 'deduped', count(*) FROM dedup
        |  UNION ALL SELECT 4, 'mixed', count(*) FROM mixed)
        |ORDER BY stage""".stripMargin),
    // HUGEINT keeps the moment products exact (BIGINT² overflows);
    // both engines then convert the SAME exact integer to double.
    "sample_neyman_alloc" ->
      """WITH s AS (
        |  SELECT event_type, count(*) AS n_h,
        |         sum(q) AS sv, sum(q * q) AS sq
        |  FROM (SELECT event_type,
        |          CAST(floor(value * 1e4 + 0.5) AS BIGINT) AS q FROM events)
        |  GROUP BY event_type),
        |v AS (
        |  SELECT event_type, n_h,
        |         CAST(CAST(n_h AS HUGEINT) * CAST(sq AS HUGEINT) -
        |              CAST(sv AS HUGEINT) * CAST(sv AS HUGEINT) AS DOUBLE) /
        |           (CAST(n_h AS DOUBLE) * CAST(n_h - 1 AS DOUBLE)) AS s2
        |  FROM s),
        |a AS (
        |  SELECT event_type, n_h, s2,
        |         CAST(floor(n_h * sqrt(s2) + 0.5) AS BIGINT) AS wq
        |  FROM v),
        |w AS (SELECT sum(wq) AS wsum FROM a)
        |SELECT event_type, n_h,
        |       floor(sqrt(s2) / 1e4 * 1e4 + 0.5) / 1e4 AS sd,
        |       CAST(floor(1000.0 * wq / wsum + 0.5) AS BIGINT) AS alloc
        |FROM a CROSS JOIN w ORDER BY event_type""".stripMargin,
    "curation_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS n_tok
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_tok,
        |         floor(CAST(n_chars AS DOUBLE) / n_tok * 1e4 + 0.5) / 1e4 AS score
        |  FROM d WHERE n_tok > 0),
        |c AS (
        |  SELECT doc_id, score, n_tok,
        |         sum(n_tok) OVER (ORDER BY score DESC, doc_id ASC
        |                          ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM s)
        |SELECT doc_id, score, n_tok, CAST(cum AS BIGINT) AS cum
        |FROM c WHERE cum - n_tok < 10000 ORDER BY doc_id""".stripMargin,
    "curation_pack_sequences" ->
      """SELECT doc_id, n_tok,
        |       CAST(floor((cum - n_tok) / 2048.0) AS BIGINT) AS chunk
        |FROM (
        |  SELECT doc_id,
        |    len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS n_tok,
        |    sum(len(list_filter(string_split(trim(text), ' '), x -> x <> '')))
        |      OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "sample_weighted" ->
      """SELECT doc_id, n_chars,
        |       floor(key * 1000 * 1e6 + 0.5) / 1e6 AS k1000
        |FROM (
        |  SELECT doc_id, n_chars,
        |    -ln(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |          / 4294967296.0) / n_chars AS key
        |  FROM documents
        |  ORDER BY key ASC, doc_id ASC LIMIT 100)
        |ORDER BY doc_id""".stripMargin,
    "sample_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
        |q AS (
        |  SELECT lang, n_l,
        |         pow(n_l * 1.0 / (SELECT sum(n_l) FROM c), 0.7) AS q_raw
        |  FROM c),
        |f AS (
        |  SELECT lang,
        |    least(CAST(1.0 AS DOUBLE),
        |      (q_raw / (SELECT sum(q_raw) FROM q))
        |        * (SELECT min(n_l / (q_raw / (SELECT sum(q_raw) FROM q)))
        |           FROM q) / n_l) AS f
        |  FROM q)
        |SELECT d.doc_id, d.lang FROM documents d JOIN f USING (lang)
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        / 4294967296.0 < f
        |ORDER BY d.doc_id""".stripMargin,
    "sample_domain_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
        |p AS (
        |  SELECT lang, n_l,
        |    CASE lang WHEN 'en' THEN CAST(0.40 AS DOUBLE)
        |              WHEN 'de' THEN CAST(0.15 AS DOUBLE)
        |              WHEN 'es' THEN CAST(0.15 AS DOUBLE)
        |              WHEN 'fr' THEN CAST(0.15 AS DOUBLE)
        |              WHEN 'zh' THEN CAST(0.15 AS DOUBLE) END AS p
        |  FROM c WHERE CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 1 WHEN 'es' THEN 1
        |                         WHEN 'fr' THEN 1 WHEN 'zh' THEN 1 ELSE 0 END = 1),
        |t AS (SELECT min(n_l / p) AS t_max FROM p),
        |f AS (SELECT lang, least(CAST(1.0 AS DOUBLE), p * t_max / n_l) AS f
        |      FROM p CROSS JOIN t)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN f USING (lang)
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        / 4294967296.0 < f
        |ORDER BY d.doc_id""".stripMargin,
    "sample_stratified_hash" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        / 4294967296.0
        |      < CASE lang WHEN 'en' THEN 0.25 WHEN 'de' THEN 0.5 ELSE 1.0 END
        |ORDER BY doc_id""".stripMargin,
    "sample_split" ->
      """WITH s AS (
        |  SELECT lang, n_chars,
        |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |              / 4294967296.0 < 0.90 THEN 'train'
        |         WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |              / 4294967296.0 < 0.95 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM s GROUP BY split, lang
        |ORDER BY split, lang""".stripMargin,
    "curation_keep_best" ->
      """WITH s AS (
        |  SELECT doc_id, lang, md5(lower(trim(text))) AS h,
        |    (CASE WHEN len(text) >= 60 AND len(text) <= 520 THEN 1 ELSE 0 END)
        |    + (CASE WHEN len(string_split(trim(text), ' ')) >= 15 THEN 1 ELSE 0 END)
        |    + (CASE WHEN len(replace(text, ' ', ''))
        |                   >= len(string_split(trim(text), ' ')) * 2
        |             AND len(replace(text, ' ', ''))
        |                   <= len(string_split(trim(text), ' ')) * 12
        |        THEN 1 ELSE 0 END)
        |    + (CASE WHEN (len(text)
        |                  - len(regexp_replace(text, '[0-9]', '', 'g'))) * 10
        |                 < len(text) * 3 THEN 1 ELSE 0 END) AS q_score
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, q_score,
        |         count(*) OVER (PARTITION BY h) AS n_dups,
        |         row_number() OVER (PARTITION BY h
        |                            ORDER BY q_score DESC, doc_id ASC) AS rn
        |  FROM s)
        |SELECT doc_id, lang, CAST(q_score AS BIGINT) AS q_score,
        |       CAST(n_dups AS BIGINT) AS n_dups
        |FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)
        |SELECT doc_id,
        |       CAST(s // 40 AS BIGINT) AS chunk_id,
        |       array_to_string(w[s+1:s+50], ' ') AS chunk,
        |       CAST(len(w[s+1:s+50]) AS BIGINT) AS n_tokens
        |FROM t, unnest(range(0, len(w), 40)) AS u(s)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "text_pii_mask" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9][0-9\-]{2,}[0-9]', '<NUM>', 'g') AS masked,
        |  CAST(len(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9][0-9\-]{2,}[0-9]', '<NUM>', 'g')) AS BIGINT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "quality_filter_pipeline" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    len(text) AS l,
        |    len(string_split(trim(text), ' ')) AS ntok,
        |    len(replace(text, ' ', '')) AS letters,
        |    len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS digits
        |  FROM documents)
        |SELECT doc_id,
        |  l >= 60 AND l <= 520 AS len_ok,
        |  ntok >= 15 AS tok_ok,
        |  letters >= ntok * 2 AND letters <= ntok * 12 AS wordlen_ok,
        |  digits * 10 < l * 3 AS digit_ok,
        |  (l >= 60 AND l <= 520) AND ntok >= 15
        |    AND (letters >= ntok * 2 AND letters <= ntok * 12)
        |    AND digits * 10 < l * 3 AS keep
        |FROM q ORDER BY doc_id""".stripMargin,
    "sample_group_cap" ->
      """SELECT doc_id, lang, rk FROM (
        |  SELECT doc_id, lang,
        |         CAST(row_number() OVER (PARTITION BY lang
        |                ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
        |              AS BIGINT) AS rk
        |  FROM documents)
        |WHERE rk <= 60
        |ORDER BY doc_id""".stripMargin,
    "dedup_containment" ->
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
        |                 nullif(len(a.g), 0)) * 1000000 + 0.5) / 1000000 AS best_containment
        |FROM grams a JOIN grams b ON a.doc_id != b.doc_id
        |GROUP BY a.doc_id ORDER BY a_id""".stripMargin
  )
}
