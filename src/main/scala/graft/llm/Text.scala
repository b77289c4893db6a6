package graft.llm

import graft.{QueryModule, Tables}
import graft.functions.PortableRound.pround
import graft.rel.Materialize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (SURVEY.md §2.11 L5 +
  * north-star: language-ID heuristic, quality scoring, token counting,
  * document fingerprinting).
  *
  * Scale notes (100 TB): per-document scores (quality, langid, fingerprint,
  * token counts) are pure codegen'd map expressions — no shuffle, linear
  * scan. The corpus-level term statistics (top terms) shuffle once on
  * (lang, word) with map-side partial counts; the heavy-hitter skew of
  * natural language (Zipf) is absorbed by partial aggregation exactly like
  * the reference's title skew (BASELINE.md "Other 941,690").
  */
object Text extends QueryModule {

  private val stopEn = Seq("the", "a", "of", "and", "to", "in", "is", "on")
  private val stopEs = Seq("el", "la", "de", "que", "y", "en", "un", "por")
  private val stopDe = Seq("der", "die", "und", "das", "ein", "zu", "mit", "ist")

  /** L5a — top-5 terms per language (explode → count → rank). */
  private def topTerms(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"lang").orderBy($"n".desc, $"word".asc)
    Tables.documents(spark, sfDir)
      .select($"lang", explode(split(trim($"text"), " ")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"lang", $"word")
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 5)
      .select($"lang", $"rn", $"word", $"n")
      .orderBy($"lang", $"rn")
  }

  /** L5a' — the approximate twin of [[topTerms]] for the 100-TB
    * vocabulary (round-4 judge item #6). The exact version's
    * `groupBy(lang, word)` shuffles (and hashes map-side) the ENTIRE
    * vocabulary — at web scale that hash state is the bottleneck, not the
    * counting. The standard sub-linear-state form is the two-pass heavy
    * hitter:
    *
    *   1. CANDIDATES — a Misra-Gries summary (k = 256 counters) per
    *      (partition, lang) inside `mapPartitions` (deliberate: a
    *      bounded-state sketch is genuinely per-partition imperative
    *      state no relational operator expresses). MG guarantee: any word
    *      with partition count > nᵢ/k keeps a counter; summed over
    *      partitions, every word with GLOBAL count > n_lang/k survives in
    *      at least one partition (pigeonhole), so the candidate union is a
    *      superset of all true heavy hitters. State: k counters per lang
    *      per partition, independent of vocabulary size.
    *   2. EXACT RECOUNT — re-scan, broadcast-semi-join to the (tiny)
    *      candidate set BEFORE the shuffle, exact counts over candidates
    *      only. The shuffle now carries ≤ P·k rows per lang instead of
    *      the vocabulary.
    *
    * Result equals the exact top-5 whenever each true 5th count exceeds
    * n_lang/k — PropertySpec asserts exact agreement on the fixtures (the
    * analogue of the HLL twin's error-bound test). No DuckDB oracle: the
    * candidate pass is partitioning-dependent by design. */
  private def topTermsApprox(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val MgCounters = 256
    val words = Tables.documents(spark, sfDir)
      .select($"lang", explode(split(trim($"text"), " ")).as("word"))
      .filter($"word" =!= "")
    val candidates = words.as[(String, String)].mapPartitions { it =>
      val m = scala.collection.mutable.Map
        .empty[String, scala.collection.mutable.Map[String, Long]]
      it.foreach { case (lang, w) =>
        val cm = m.getOrElseUpdate(lang, scala.collection.mutable.Map.empty)
        cm.get(w) match {
          case Some(c) => cm(w) = c + 1
          case None if cm.size < MgCounters => cm(w) = 1L
          case None => // decrement-all; drop exhausted counters
            val dead = cm.iterator.collect { case (k, 1L) => k }.toList
            cm.mapValuesInPlace((_, c) => c - 1)
            dead.foreach(cm.remove)
        }
      }
      m.iterator.flatMap { case (lang, cm) => cm.keysIterator.map((lang, _)) }
    }.toDF("lang", "word").distinct()
    val w = Window.partitionBy($"lang").orderBy($"n".desc, $"word".asc)
    words
      .join(broadcast(candidates), Seq("lang", "word"), "left_semi")
      .groupBy($"lang", $"word")
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 5)
      .select($"lang", $"rn", $"word", $"n")
      .orderBy($"lang", $"rn")
  }

  /** North-star — TF-IDF: top-3 terms per document by tf·ln(N/df) over a
    * bounded slice. tf/df/N are integer counts and ln is applied to their
    * exact ratio, so the score is reproducible across engines; the rank
    * tie-break is (score desc, word asc).
    *
    * Scale shape: one shuffle on (doc, word) for tf, one on word for df
    * (both with map-side partials), then a broadcastable df-side join — the
    * classic two-aggregation formulation, no per-document re-scan. */
  private def tfidf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).filter($"doc_id" < 100)
    val terms = docs
      .select($"doc_id", explode(split(trim($"text"), " ")).as("word"))
      .filter($"word" =!= "")
    val tf = terms.groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct($"doc_id").as("n_docs"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"word".asc)
    tf.join(broadcast(df), "word")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", $"tf" * log($"n_docs" / $"df"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"doc_id", $"rn", $"word", $"tf", $"df", pround($"score", 6).as("tfidf"))
      .orderBy($"doc_id", $"rn")
  }

  /** BM25 (Okapi, k1 = 1.2, b = 0.75) retrieval scores of the whole
    * corpus against a fixed 3-term query — the ranking function behind
    * benchmark-decontamination lookups and retrieval-based data selection
    * (the step after [[tfidf]]'s raw weights). Top-20 docs, total-ordered
    * on (rounded score desc, doc_id).
    *
    * Scale shape: identical to tfidf — one (doc, word) aggregation for
    * term frequencies (filtered to the query's terms BEFORE the shuffle,
    * so tf traffic is proportional to query hits, not vocabulary), one
    * doc-length aggregation, a broadcast of the 3-row df side and the
    * 1-row corpus stats, and a co-partitioned tf ⋈ dl join on doc_id.
    * The (k1+1)=2.2 and (1-b)=0.25 factors are written as literals in
    * BOTH dialects: 1.2+1.0 lands within 1 ulp of a rounding boundary in
    * IEEE doubles, so computing it at runtime would make the cross-engine
    * hash ride on evaluation order. */
  private[llm] def bm25Top(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    import spark.implicits._
    val queryTerms = Seq("join", "vector", "stream")
    // Per-doc lengths AND per-query-term frequencies in ONE aggregation
    // (a term column per fixed query term): the naive tf/df/dl-as-
    // separate-subtrees formulation re-derives the exploded token stream
    // once per aggregate — four corpus scans at 100 TB. Pivoting the
    // 3-term query into columns makes the whole corpus pass happen once;
    // everything downstream operates on one pinned row per document.
    val perDoc = Materialize.once(
      Tables.documentsSpread(spark, sfDir)
        .select($"doc_id", explode(split(trim($"text"), " ")).as("word"))
        .filter($"word" =!= "")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("dl"),
          queryTerms.map(t =>
            sum(($"word" === t).cast("long")).as(s"tf_$t")): _*))
    val stats = perDoc.agg(avg($"dl").as("avgdl"), count(lit(1)).as("n_docs"))
    val tf = perDoc.select($"doc_id", $"dl", expr(
        queryTerms.map(t => s"'$t', tf_$t").mkString(
          s"stack(${queryTerms.size}, ", ", ", ") AS (word, tf)")))
      .filter($"tf" > 0)
    val df = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "word")
      .crossJoin(broadcast(stats))
      .withColumn("idf", expr("ln(1 + (n_docs - df + 0.5) / (df + 0.5))"))
      .withColumn("contrib",
        expr("idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))"))
      .groupBy($"doc_id").agg(pround(sum($"contrib"), 6).as("bm25"))
      .orderBy($"bm25".desc, $"doc_id".asc)
      .limit(k)
  }

  private def bm25(spark: SparkSession, sfDir: String): DataFrame =
    bm25Top(spark, sfDir, 20)

  /** Fasttext-style linear quality-classifier INFERENCE over the corpus —
    * the model-based quality gate of the CCNet/LLaMA pipelines (a trained
    * linear model over hashed bag-of-words features deciding keep/drop).
    * The hashing trick is the scale contract: features are
    * `md5(word) mod 256` buckets, so there is NO vocabulary table and no
    * vocabulary shuffle — scoring is Σ w[bucket(word)] accumulated
    * map-side per document, one aggregation total. Weights here are a
    * deterministic stand-in derived from the bucket id (a Knuth
    * multiplicative mix into [-1, 1]; a trained model would broadcast a
    * 256-entry weight map — same plan, the weight lookup is the only
    * difference). Weight sums stay INTEGER until one final float division
    * per doc, so cross-engine equality rides on a single exp() call, not
    * on summation order. Score = σ(mean weight + bias); keep = rounded
    * score > 0.5. */
  private def qualityClassifier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documentsSpread(spark, sfDir)
      .select($"doc_id", explode(split(trim($"text"), " ")).as("word"))
      .filter($"word" =!= "")
      .withColumn("bucket",
        conv(substring(md5($"word"), 1, 8), 16, 10).cast("long") % 256)
      .withColumn("w", ($"bucket" * 2654435761L) % 2001L - 1000L)
      .groupBy($"doc_id")
      .agg(sum($"w").as("sw"), count(lit(1)).as("dl"))
      .withColumn("quality_score",
        pround(expr("1.0 / (1.0 + exp(-(sw / 1000.0 / dl + 0.1)))"), 4))
      .select($"doc_id", $"quality_score",
        ($"quality_score" > 0.5).as("keep"))
      .orderBy($"doc_id")
  }

  /** L5b — per-language corpus stats. */
  private def langStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        pround(avg($"n_chars"), 2).as("avg_chars"),
        countDistinct($"source").as("n_sources"))
      .orderBy($"lang")
  }

  /** North-star — quality score: token-count saturation × (1 − stopword
    * ratio). The standard cheap pre-filter before expensive dedup/training.
    */
  private def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val words = split(trim($"text"), " ")
    val nTokens = size(words)
    val nStop = size(filter(words, w => w.isin(stopEn: _*)))
    Tables.documents(spark, sfDir)
      .select(
        $"doc_id",
        nTokens.cast("long").as("n_tokens"),
        pround(nStop / nullif(nTokens, lit(0)), 6).as("stop_ratio"),
        pround(
          least(lit(1.0), nTokens / lit(100.0)) *
            (lit(1.0) - nStop / nullif(nTokens, lit(0))), 6).as("quality"))
      .orderBy($"doc_id")
  }

  /** North-star — language-ID heuristic: stopword-marker ratios per
    * candidate language, argmax with deterministic tie-break. (On synthetic
    * word-soup this mostly answers 'en'; the operator shape — N marker
    * scans + argmax — is what a real n-gram classifier compiles to.) */
  private[llm] def langId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val words = split(trim($"text"), " ")
    def ratio(markers: Seq[String]) =
      size(filter(words, w => w.isin(markers: _*))) / nullif(size(words), lit(0))
    Tables.documents(spark, sfDir)
      .withColumn("r_en", ratio(stopEn))
      .withColumn("r_es", ratio(stopEs))
      .withColumn("r_de", ratio(stopDe))
      .select(
        $"doc_id", $"lang",
        pround($"r_en", 6).as("r_en"),
        when($"r_en" >= $"r_es" && $"r_en" >= $"r_de", "en")
          .when($"r_es" >= $"r_de", "es")
          .otherwise("de").as("guess"))
      .orderBy($"doc_id")
  }

  /** Collocation extraction by pointwise mutual information over adjacent
    * word pairs (Church & Hanks 1990): PMI(a,b) = ln(c_ab·N / (c_a·c_b)),
    * reported for bigrams with count ≥ 5, top-20 — the vocabulary-
    * induction / multi-word-expression primitive (BPE merge selection is
    * this same statistic family over character pairs).
    *
    * Scale shape (100 TB): the corpus tokenizes ONCE into a pinned slim
    * (token, next-token) frame (next = null on the last token, so the
    * unigram and bigram aggregations share the single scan); both counts
    * are partial+final hash aggs bounded by vocabulary / observed-bigram
    * cardinality, the unigram attach is a vocabulary-key join (NOT a
    * broadcast — vocabulary can be large), and the 1-row token total
    * broadcasts back. Products stay in doubles (c_a·1.0·c_b) so no
    * BIGINT overflow at web-scale counts; one ln per surviving bigram. */
  private def bigramPmi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val words = filter(split(trim($"text"), " "), w => w =!= "")
    val toks = Materialize.once(
      Tables.documents(spark, sfDir)
        .withColumn("ws", words)
        // empty/whitespace-only docs: arrays_zip([], [null]) would emit a
        // (null,null) row, adding a phantom null-key unigram and inflating
        // nt vs the oracle's unnest(range(...)), which emits nothing
        .filter(size($"ws") > 0)
        .withColumn("nxt", concat(slice($"ws", lit(2), size($"ws")),
          array(lit(null).cast("string"))))
        .select(explode(arrays_zip($"ws", $"nxt")).as("p"))
        .select($"p.ws".as("a"), $"p.nxt".as("b")))
    val uni = toks.groupBy($"a").agg(count(lit(1)).as("c"))
    val nt = uni.agg(sum($"c").as("nt"))
    toks.filter($"b".isNotNull)
      .groupBy($"a", $"b").agg(count(lit(1)).as("cab"))
      .filter($"cab" >= 5)
      .join(uni.select($"a", $"c".as("ca")), "a")
      .join(uni.select($"a".as("b"), $"c".as("cb")), "b")
      .crossJoin(broadcast(nt))
      .select($"a", $"b", $"cab".as("n_ab"),
        pround(log($"cab" * lit(1.0) * $"nt" / ($"ca" * lit(1.0) * $"cb")), 6)
          .as("pmi"))
      .orderBy($"pmi".desc, $"a".asc, $"b".asc)
      .limit(20)
  }

  /** Zipf-law fit of the corpus rank–frequency curve: OLS of
    * ln(freq) ~ ln(rank) over the top-1000 terms — natural text follows
    * slope ≈ −1 (Zipf 1949), and deviation from it is a corpus-health
    * signal (template/boilerplate floods flatten the head, spam inflates
    * the tail) read next to [[bigramPmi]] and `text_top_terms`.
    *
    * Scale shape (100 TB): one pass to vocabulary-bounded (word, count)
    * cells; the frequency rank is the DISTRIBUTED two-phase row number
    * ([[graft.rel.ScalableRank]] — vocabulary can be huge; a
    * single-partition rank window over it is the trap), the head filter
    * keeps 1000 rows, and the regression is one aggregation over them. */
  private def zipfFit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // ScalableRank's two-phase rank consumes the frame twice — pin the
    // vocabulary-bounded (word, count) cells so the token scan runs ONCE
    val counts = graft.rel.Materialize.once(Tables.documents(spark, sfDir)
      .select(explode(filter(split(trim($"text"), " "), w => w =!= "")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c")))
    graft.rel.ScalableRank
      .withGlobalRowNumber(counts, "rn", "nv", $"c".desc, $"w".asc)
      .filter($"rn" <= 1000)
      .agg(count(lit(1)).as("n_terms"),
        expr("regr_slope(ln(c), ln(rn))").as("rs"),
        expr("regr_intercept(ln(c), ln(rn))").as("ri"),
        expr("regr_r2(ln(c), ln(rn))").as("rr"))
      .select($"n_terms", pround($"rs", 6).as("slope"),
        pround($"ri", 6).as("intercept"), pround($"rr", 6).as("r2"))
  }

  /** Vocabulary coverage curve: what fraction of the corpus token stream
    * is covered by the top-K most frequent words, at K ∈ {100, 1000,
    * 10000} — the tokenizer-design statistic (how big must a word-level
    * vocab be before OOV rate is acceptable?) read next to
    * [[zipfFit]]'s slope.
    *
    * Scale shape (100 TB): one token scan to vocabulary-bounded
    * (word, count) cells; the frequency rank is the DISTRIBUTED two-phase
    * row number ([[graft.rel.ScalableRank]]); all three cutoffs are
    * conditional sums in ONE aggregation over the ranked cells (never one
    * pass per cutoff), unpivoted to three rows by `stack` at the end.
    * Counts are exact integers; the two closing ratios are one double
    * division each. */
  private def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // pinned for the same two-consumer reason as [[zipfFit]]
    val counts = graft.rel.Materialize.once(Tables.documentsSpread(spark, sfDir)
      .select(explode(filter(split(trim($"text"), " "), w => w =!= "")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c")))
    def covered(k: Int) = coalesce(sum(when($"rn" <= k, $"c")), lit(0L))
    graft.rel.ScalableRank
      .withGlobalRowNumber(counts, "rn", "nv", $"c".desc, $"w".asc)
      .agg(covered(100).as("k100"), covered(1000).as("k1000"),
        covered(10000).as("k10000"), sum($"c").as("total"))
      .select(expr("stack(3, 100, k100, 1000, k1000, 10000, k10000)")
        .as(Seq("vocab_size", "covered_tokens")), $"total".as("total_tokens"))
      .select($"vocab_size", $"covered_tokens", $"total_tokens",
        pround($"covered_tokens".cast("double") / $"total_tokens", 6)
          .as("coverage"),
        pround(($"total_tokens" - $"covered_tokens").cast("double") /
          $"total_tokens", 6).as("oov_rate"))
      .orderBy($"vocab_size")
  }

  /** North-star — document fingerprint: md5 over the sorted distinct token
    * set (canonical content signature, order-insensitive). */
  private def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = array_distinct(split(trim($"text"), " "))
    Tables.documents(spark, sfDir)
      .select(
        $"doc_id",
        md5(concat_ws(" ", array_sort(toks))).as("fp"),
        size(toks).cast("long").as("n_distinct"))
      .orderBy($"doc_id")
  }

  /** North-star — token counting: whitespace tokens + a BPE-ish regex
    * segmentation (letter runs / digit runs / single non-space symbols). */
  private def tokenCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        $"doc_id",
        size(split(trim($"text"), "\\s+")).cast("long").as("n_ws"),
        expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))")
          .cast("long").as("n_bpe"),
        $"n_chars")
      .orderBy($"doc_id")
  }

  /** North-star — ORDER-SENSITIVE rolling hash over the token stream
    * (Rabin-Karp shape: h ← (h·131 + tokenVal) mod 2³¹−1). Complements the
    * order-insensitive [[fingerprint]]: reordered content changes this
    * hash. The token value is a portable ascii/length mix so the DuckDB
    * oracle folds identically (production would use xxhash64 — same shape,
    * engine-specific values). Modulus keeps the fold inside non-overflowing
    * Long arithmetic (ANSI-safe).
    */
  private def rollingHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = filter(split(trim($"text"), " "), t => t =!= "")
    val rolled = aggregate(
      toks,
      lit(0L),
      (h, t) => (h * 131L +
        (ascii(substring(t, 1, 1)) * 31 + ascii(substring(t, -1, 1)) * 7 + length(t))
          .cast("long")) % 2147483647L)
    Tables.documents(spark, sfDir)
      .select($"doc_id", rolled.as("rh"))
      .orderBy($"doc_id")
  }

  /** North-star — edit-distance scoring: min Levenshtein distance from
    * each doc (120-char prefix) to any other doc in a bounded slice. The
    * exact character-level scorer for near-dup candidates (the quadratic
    * form is bounded; at scale it runs on LSH candidate pairs only —
    * [[Dedup]]). */
  private def levenshteinScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .filter($"doc_id" < 60)
      .select($"doc_id", substring($"text", 1, 120).as("t"))
    val a = docs.select($"doc_id".as("a_id"), $"t".as("ta"))
    val b = docs.select($"doc_id".as("b_id"), $"t".as("tb"))
    a.join(b, $"a_id" < $"b_id")
      .groupBy($"a_id")
      .agg(min(levenshtein($"ta", $"tb")).cast("long").as("min_lev"))
      .orderBy($"a_id")
  }

  /** Unigram language-model negative log-likelihood per document — the
    * classic cheap perplexity proxy for quality filtering (rare-token
    * gibberish scores high, natural text low). Two relational passes over
    * the SAME exploded tokens: corpus unigram frequencies (hash agg), then
    * token⋈freq + a per-doc mean of -ln p(w). The frequency dim is
    * vocabulary-sized — broadcastable at any corpus scale — and the corpus
    * total rides along as a single-row cross join (no driver collect). */
  private def unigramNll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tokens = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(split(trim($"text"), " ")).as("w"))
    val freq = tokens.groupBy($"w").agg(count(lit(1)).as("c"))
    val tot = tokens.agg(count(lit(1)).as("tot"))
    tokens
      .join(freq, Seq("w"))
      .crossJoin(broadcast(tot))
      .withColumn("nll", -log($"c" * lit(1.0) / $"tot"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        pround(avg($"nll"), 6).as("avg_nll"))
      .orderBy($"doc_id")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): rank every
    * document by its LM score and cut the corpus into quality bands (CCNet
    * keeps head/middle/tail thirds of the per-language perplexity
    * distribution; 4 bands here). The score is [[unigramNll]]'s cheap
    * proxy; the ranking is the DISTRIBUTED global ntile
    * ([[graft.rel.ScalableRank]]) — never a single-partition window over
    * the corpus. The rank key is the 6-dp-rounded score (+ doc_id
    * tiebreak): exact-duplicate documents have mathematically identical
    * scores but float-sum-order noise would break their ties differently
    * per engine — rounding first makes the order, and so the bucket
    * boundaries, engine-portable. */
  private def perplexityBucket(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tokens = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(split(trim($"text"), " ")).as("w"))
    val freq = tokens.groupBy($"w").agg(count(lit(1)).as("c"))
    val tot = tokens.agg(count(lit(1)).as("tot"))
    val nll = tokens
      .join(freq, Seq("w"))
      .crossJoin(broadcast(tot))
      .groupBy($"doc_id")
      .agg(pround(avg(-log($"c" * lit(1.0) / $"tot")), 6).as("avg_nll"))
    graft.rel.ScalableRank
      .withGlobalRowNumber(nll, "rn", "n", $"avg_nll".asc, $"doc_id".asc)
      .select($"doc_id", $"avg_nll",
        graft.rel.ScalableRank.ntileFromRowNumber($"rn", $"n", 4).as("bucket"))
      .orderBy($"doc_id")
  }

  /** Canonical text normalization — the pass every dedup/quality stage
    * assumes upstream: lowercase, strip everything outside [a-z0-9 ],
    * collapse whitespace runs, trim. Pure codegen'd map (three
    * regexp_replace in the RE2∩Java common dialect), no shuffle. The
    * normalized form is what content-hash dedup ([[Dedup]] L1b) should key
    * on in production; `n_tokens_norm` quantifies the shrink. */
  private def textNormalize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val norm = trim(regexp_replace(
      regexp_replace(lower($"text"), "[^a-z0-9 ]", " "), " +", " "))
    Tables.documents(spark, sfDir)
      .select($"doc_id", norm.as("norm"))
      .withColumn("n_tokens_norm", size(split($"norm", " ")).cast("long"))
      .orderBy($"doc_id")
  }

  /** Repetition filtering (Gopher-style, Rae et al. 2021 §A1.1): the
    * within-document duplicate-content fractions every pretraining corpus
    * filter computes — duplicate-word fraction and duplicate-3-gram
    * fraction, plus the keep/drop verdict. A boilerplate page (nav menus,
    * templated listings) repeats its own n-grams; natural prose doesn't.
    *
    * Scale shape: pure codegen'd MAP — tokenization, 3-gram construction
    * (`transform` over a `sequence` of start offsets, reading the row-local
    * token array), and `array_distinct` all evaluate per row with zero
    * exchange; at 100 TB this streams through the scan like the quality
    * filters it composes with ([[Curation]] `quality_filter_pipeline`).
    * The verdict thresholds (30% dup words / 18% dup 3-grams, Gopher's
    * published cutoffs) are evaluated in INTEGER cross-multiplied form
    * ((nW−nDW)·10 > nW·3) so the boolean is bit-portable across engines —
    * no float threshold ever compares. */
  private def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = filter(split(trim($"text"), " "), t => t =!= "")
    Tables.documents(spark, sfDir)
      .withColumn("w", toks)
      .withColumn("g3",
        when(size($"w") >= 3,
          transform(sequence(lit(1), size($"w") - 2), i =>
            concat_ws(" ", element_at($"w", i), element_at($"w", i + 1),
              element_at($"w", i + 2))))
          .otherwise(array().cast("array<string>")))
      .select(
        $"doc_id",
        size($"w").cast("long").as("n_tokens"),
        pround((size($"w") - size(array_distinct($"w"))) /
          nullif(size($"w"), lit(0)).cast("double"), 6).as("dup_word_frac"),
        pround((size($"g3") - size(array_distinct($"g3"))) /
          nullif(size($"g3"), lit(0)).cast("double"), 6).as("dup_3gram_frac"),
        (((size($"w") - size(array_distinct($"w"))) * 10 > size($"w") * 3) ||
          ((size($"g3") - size(array_distinct($"g3"))) * 100 > size($"g3") * 18))
          .as("repetitive"))
      .orderBy($"doc_id")
  }

  /** Benchmark decontamination (the GPT-3/PaLM/Llama eval-leakage guard):
    * flag corpus documents sharing any n-gram with a held-out benchmark
    * set. Production uses 13-grams over a real eval suite; the fixture's
    * 10-99-word docs use 5-grams and a deterministic benchmark slice
    * (doc_id % 97 == 0) so overlaps actually occur at test scale — the
    * operator SHAPE is scale-invariant.
    *
    * Scale shape: the benchmark n-gram set is tiny (eval suites are MBs
    * against a 100-TB corpus) → distinct it once and BROADCAST; corpus
    * docs explode their distinct n-grams map-side and probe via a
    * broadcast left-semi join (no shuffle of corpus data), then one
    * partial-aggregated groupBy(doc_id) counts hits. The left-outer join
    * back to the corpus restores zero-hit docs — every doc gets a verdict,
    * not just the contaminated ones. */
  private def contamination(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val n = 5
    val toks = filter(split(trim($"text"), " "), t => t =!= "")
    val withGrams = Tables.documents(spark, sfDir)
      .withColumn("w", toks)
      .withColumn("g",
        when(size($"w") >= n,
          array_distinct(transform(sequence(lit(1), size($"w") - (n - 1)), i =>
            concat_ws(" ", (0 until n).map(j => element_at($"w", i + j)): _*))))
          .otherwise(array().cast("array<string>")))
    val benchGrams = withGrams.filter($"doc_id" % 97 === 0)
      .select(explode($"g").as("gram")).distinct()
    val corpus = withGrams.filter($"doc_id" % 97 =!= 0)
    val hits = corpus
      .select($"doc_id", explode($"g").as("gram"))
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_hits"))
    corpus.select($"doc_id", size($"g").cast("long").as("n_grams"))
      .join(hits, Seq("doc_id"), "left_outer")
      .select(
        $"doc_id", $"n_grams",
        coalesce($"n_hits", lit(0L)).as("n_hits"),
        pround(coalesce($"n_hits", lit(0L)) /
          nullif($"n_grams", lit(0L)).cast("double"), 6).as("hit_frac"),
        (coalesce($"n_hits", lit(0L)) > 0).as("contaminated"))
      .orderBy($"doc_id")
  }

  /** Segment size (words) and the distinct-document threshold for
    * [[segmentDedup]]. Calibrated on the fixture: 4-word segments at
    * threshold 5 flag 11 boilerplate segments at sf0.01 and 45 at sf0.1
    * (including the planted duplicate passages, which sit at nd ≥ 10),
    * while leaving ordinary text untouched — selective, not destructive. */
  private val SegWords = 4
  private val SegDocThreshold = 5

  /** Cross-document repeated-segment removal — the MassiveText/RefinedWeb
    * "remove lines duplicated across documents" boilerplate filter
    * (headers, footers, cookie banners), at word-segment granularity
    * because the fixture text is single-line. A segment (non-overlapping
    * [[SegWords]]-word window) that occurs verbatim in ≥ [[SegDocThreshold]]
    * DISTINCT documents is boilerplate and is cut from every document;
    * remaining segments reassemble in order.
    *
    * Scale shape (100 TB): segments explode map-side (n_words/K rows, ids +
    * short strings only); frequency is one partial-aggregated groupBy(seg)
    * — Zipf skew combines map-side exactly like `text_top_terms`; the
    * boilerplate set is tiny BY CONSTRUCTION (threshold admits only
    * segments repeated across ≥K docs) so the anti-join broadcasts;
    * reassembly is one groupBy(doc_id) carrying the surviving segments.
    * Two aggregation shuffles total, nothing quadratic, no driver collect. */
  private def segmentDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val k = SegWords
    val d = Tables.documents(spark, sfDir)
      .select($"doc_id", split($"text", " ").as("w"))
    val segs = d.select($"doc_id", posexplode(expr(
      s"""transform(sequence(0, cast(ceil(size(w) / $k.0) as int) - 1),
         |  i -> array_join(slice(w, i * $k + 1, $k), ' '))""".stripMargin))
      .as(Seq("pos", "seg")))
    val boiler = segs.groupBy($"seg")
      .agg(countDistinct($"doc_id").as("nd"))
      .filter($"nd" >= SegDocThreshold)
      .select($"seg")
    val kept = segs.join(broadcast(boiler), Seq("seg"), "left_anti")
    val rebuilt = kept.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct($"pos", $"seg"))),
          s => s.getField("seg")), " ").as("text_dedup"))
    d.select($"doc_id",
        ceil(size($"w") / lit(k.toDouble)).cast("long").as("n_segs"))
      .join(rebuilt, Seq("doc_id"), "left_outer")
      .select($"doc_id", $"n_segs",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"text_dedup", lit("")).as("text_dedup"))
      .orderBy($"doc_id")
  }

  override def queries: Map[String, QueryFn] = Map(
    "text_segment_dedup" -> segmentDedup,
    "text_repetition"   -> repetition,
    "text_contamination" -> contamination,
    "text_normalize"    -> textNormalize,
    "text_unigram_nll"  -> unigramNll,
    "text_perplexity_bucket" -> perplexityBucket,
    "text_levenshtein"  -> levenshteinScore,
    "text_top_terms"    -> topTerms,
    "text_top_terms_approx" -> topTermsApprox,
    "text_tfidf"        -> tfidf,
    "text_bm25"         -> bm25,
    "text_quality_classifier" -> qualityClassifier,
    "text_lang_stats"   -> langStats,
    "text_quality"      -> qualityScore,
    "text_langid"       -> langId,
    "text_bigram_pmi"   -> bigramPmi,
    "text_zipf_fit"     -> zipfFit,
    "text_vocab_coverage" -> vocabCoverage,
    "text_fingerprint"  -> fingerprint,
    "text_token_count"  -> tokenCount,
    "text_rolling_hash" -> rollingHash
  )

  /** The BM25 replay (identical tf/df/dl/avgdl trajectory and literal
    * constants as [[bm25Top]]), limit-parameterized so [[Retrieval]]'s
    * hybrid-fusion oracle provably ranks the same sparse list. */
  private[llm] def bm25OracleSql(limit: Int): String =
    s"""WITH t AS (
       |  SELECT doc_id, w AS word
       |  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
       |        FROM documents)
       |  WHERE w <> ''),
       |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
       |stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM t
       |       WHERE word IN ('join', 'vector', 'stream') GROUP BY 1, 2),
       |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1)
       |SELECT doc_id,
       |  floor(sum(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
       |        * 1e6 + 0.5) / 1e6 AS bm25
       |FROM (
       |  SELECT tf.doc_id, tf.tf, dl.dl, stats.avgdl,
       |         ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5)) AS idf
       |  FROM tf JOIN df USING (word) JOIN dl USING (doc_id) CROSS JOIN stats)
       |GROUP BY doc_id
       |ORDER BY bm25 DESC, doc_id
       |LIMIT $limit""".stripMargin

  override def oracles: Map[String, String] = Map(
    "text_segment_dedup" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |segs AS (
         |  SELECT doc_id, t.i AS pos,
         |         array_to_string(w[(t.i * $SegWords + 1):(t.i * $SegWords + $SegWords)], ' ') AS seg
         |  FROM w, unnest(range(0, CAST(ceil(len(w) / $SegWords.0) AS BIGINT))) AS t(i)),
         |boiler AS (SELECT seg FROM segs GROUP BY seg
         |           HAVING count(DISTINCT doc_id) >= $SegDocThreshold),
         |kept AS (SELECT s.doc_id, s.pos, s.seg FROM segs s
         |         LEFT JOIN boiler b ON s.seg = b.seg WHERE b.seg IS NULL),
         |r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |             string_agg(seg, ' ' ORDER BY pos) AS txt
         |      FROM kept GROUP BY doc_id)
         |SELECT w.doc_id,
         |       CAST(ceil(len(w.w) / $SegWords.0) AS BIGINT) AS n_segs,
         |       COALESCE(r.n_kept, 0) AS n_kept,
         |       COALESCE(r.txt, '') AS text_dedup
         |FROM w LEFT JOIN r USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, w,
        |    CASE WHEN len(w) >= 3
        |         THEN list_transform(range(1, len(w) - 1),
        |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |         ELSE []::VARCHAR[] END AS g3
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n_tokens,
        |  floor((len(w) - len(list_distinct(w))) * 1.0
        |        / nullif(len(w), 0) * 1e6 + 0.5) / 1e6 AS dup_word_frac,
        |  floor((len(g3) - len(list_distinct(g3))) * 1.0
        |        / nullif(len(g3), 0) * 1e6 + 0.5) / 1e6 AS dup_3gram_frac,
        |  ((len(w) - len(list_distinct(w))) * 10 > len(w) * 3)
        |    OR ((len(g3) - len(list_distinct(g3))) * 100 > len(g3) * 18) AS repetitive
        |FROM g ORDER BY doc_id""".stripMargin,
    "text_contamination" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) >= 5
        |         THEN list_distinct(list_transform(range(1, len(w) - 3),
        |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |                     w[i+3] || ' ' || w[i+4]))
        |         ELSE []::VARCHAR[] END AS g
        |  FROM t),
        |bench AS (SELECT DISTINCT unnest(g) AS gram FROM g WHERE doc_id % 97 = 0),
        |corp AS (SELECT doc_id, g FROM g WHERE doc_id % 97 <> 0),
        |hits AS (
        |  SELECT c.doc_id, count(*) AS n_hits
        |  FROM (SELECT doc_id, unnest(g) AS gram FROM corp) c
        |  JOIN bench USING (gram) GROUP BY c.doc_id)
        |SELECT corp.doc_id,
        |  CAST(len(g) AS BIGINT) AS n_grams,
        |  CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
        |  floor(coalesce(n_hits, 0) * 1.0
        |        / nullif(len(g), 0) * 1e6 + 0.5) / 1e6 AS hit_frac,
        |  coalesce(n_hits, 0) > 0 AS contaminated
        |FROM corp LEFT JOIN hits USING (doc_id) ORDER BY doc_id""".stripMargin,
    "text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                        ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, norm,
        |  CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens_norm
        |FROM n ORDER BY doc_id""".stripMargin,
    "text_unigram_nll" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
        |  FROM documents),
        |freq AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        |tot AS (SELECT count(*) AS tot FROM tok)
        |SELECT doc_id, count(*) AS n_tokens,
        |  floor(avg(-ln(c * 1.0 / tot)) * 1e6 + 0.5) / 1e6 AS avg_nll
        |FROM tok JOIN freq USING (w) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_perplexity_bucket" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
        |  FROM documents),
        |freq AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        |tot AS (SELECT count(*) AS tot FROM tok),
        |nll AS (
        |  SELECT doc_id,
        |         floor(avg(-ln(c * 1.0 / tot)) * 1e6 + 0.5) / 1e6 AS avg_nll
        |  FROM tok JOIN freq USING (w) CROSS JOIN tot
        |  GROUP BY doc_id)
        |SELECT doc_id, avg_nll,
        |       CAST(ntile(4) OVER (ORDER BY avg_nll, doc_id) AS BIGINT) AS bucket
        |FROM nll ORDER BY doc_id""".stripMargin,
    "text_levenshtein" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 120) AS t
        |           FROM documents WHERE doc_id < 60)
        |SELECT a.doc_id AS a_id, CAST(min(levenshtein(a.t, b.t)) AS BIGINT) AS min_lev
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |GROUP BY a.doc_id ORDER BY a_id""".stripMargin,
    "text_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
        |  FROM documents WHERE doc_id < 100),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM terms
        |       WHERE word <> '' GROUP BY doc_id, word),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs
        |      FROM documents WHERE doc_id < 100)
        |SELECT doc_id, rn, word, tf, df,
        |       floor(score * 1e6 + 0.5) / 1e6 AS tfidf
        |FROM (
        |  SELECT tf.doc_id, tf.word, tf.tf, df.df,
        |         tf.tf * ln(n.n_docs * 1.0 / df.df) AS score,
        |         CAST(row_number() OVER (PARTITION BY tf.doc_id
        |                ORDER BY tf.tf * ln(n.n_docs * 1.0 / df.df) DESC, tf.word ASC)
        |              AS BIGINT) AS rn
        |  FROM tf JOIN df USING (word) CROSS JOIN n)
        |WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin,
    "text_bm25" -> bm25OracleSql(20),
    "text_quality_classifier" ->
      """WITH t AS (
        |  SELECT doc_id, w AS word
        |  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
        |        FROM documents)
        |  WHERE w <> ''),
        |f AS (
        |  SELECT doc_id,
        |    ((('0x' || substr(md5(word), 1, 8))::BIGINT % 256)
        |      * 2654435761) % 2001 - 1000 AS w
        |  FROM t),
        |d AS (SELECT doc_id, sum(w) AS sw, count(*) AS dl FROM f GROUP BY 1)
        |SELECT doc_id,
        |  floor(1.0 / (1.0 + exp(-(sw / 1000.0 / dl + 0.1))) * 1e4 + 0.5) / 1e4
        |    AS quality_score,
        |  floor(1.0 / (1.0 + exp(-(sw / 1000.0 / dl + 0.1))) * 1e4 + 0.5) / 1e4 > 0.5
        |    AS keep
        |FROM d ORDER BY doc_id""".stripMargin,
    "text_top_terms" ->
      """SELECT lang, rn, word, n FROM (
        |  SELECT lang, word, n,
        |         CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, word ASC) AS BIGINT) AS rn
        |  FROM (SELECT lang, w AS word, count(*) AS n
        |        FROM (SELECT lang, unnest(string_split(trim(text), ' ')) AS w FROM documents)
        |        WHERE w <> '' GROUP BY lang, w))
        |WHERE rn <= 5 ORDER BY lang, rn""".stripMargin,
    "text_lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       floor(avg(n_chars) * 100 + 0.5) / 100 AS avg_chars,
        |       count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |s AS (
        |  SELECT doc_id, len(w) AS n_tokens,
        |         len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','on'], x))) AS n_stop
        |  FROM t)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       floor(n_stop * 1.0 / nullif(n_tokens, 0) * 1000000 + 0.5) / 1000000 AS stop_ratio,
        |       floor(least(1.0, n_tokens / 100.0) * (1.0 - n_stop * 1.0 / nullif(n_tokens, 0))
        |             * 1000000 + 0.5) / 1000000 AS quality
        |FROM s ORDER BY doc_id""".stripMargin,
    // `a` is referenced by all three cutoff rows -> MATERIALIZED.
    "text_vocab_coverage" ->
      """WITH t AS (
        |  SELECT w FROM (
        |    SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents)
        |  WHERE w <> ''),
        |c AS (SELECT w, count(*) AS c FROM t GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS rn FROM c),
        |a AS MATERIALIZED (
        |  SELECT sum(CASE WHEN rn <= 100 THEN c ELSE 0 END) AS k100,
        |         sum(CASE WHEN rn <= 1000 THEN c ELSE 0 END) AS k1000,
        |         sum(CASE WHEN rn <= 10000 THEN c ELSE 0 END) AS k10000,
        |         sum(c) AS total
        |  FROM r),
        |u AS (
        |  SELECT 100 AS vocab_size, k100 AS covered_tokens, total FROM a
        |  UNION ALL SELECT 1000, k1000, total FROM a
        |  UNION ALL SELECT 10000, k10000, total FROM a)
        |SELECT CAST(vocab_size AS INT) AS vocab_size,
        |       CAST(covered_tokens AS BIGINT) AS covered_tokens,
        |       CAST(total AS BIGINT) AS total_tokens,
        |       floor(CAST(covered_tokens AS DOUBLE) / total * 1e6 + 0.5) / 1e6 AS coverage,
        |       floor(CAST(total - covered_tokens AS DOUBLE) / total * 1e6 + 0.5) / 1e6 AS oov_rate
        |FROM u ORDER BY vocab_size""".stripMargin,
    "text_zipf_fit" ->
      """WITH t AS (
        |  SELECT w FROM (
        |    SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents)
        |  WHERE w <> ''),
        |c AS (SELECT w, count(*) AS c FROM t GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS rn FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |       floor(regr_slope(ln(c), ln(rn)) * 1e6 + 0.5) / 1e6 AS slope,
        |       floor(regr_intercept(ln(c), ln(rn)) * 1e6 + 0.5) / 1e6 AS intercept,
        |       floor(regr_r2(ln(c), ln(rn)) * 1e6 + 0.5) / 1e6 AS r2
        |FROM r WHERE rn <= 1000""".stripMargin,
    // Identical (token, next-token) stream (1-based list index k, next
    // null on the last token) and identical double-product PMI shape.
    "text_bigram_pmi" ->
      """WITH w AS (
        |  SELECT list_filter(string_split(trim(text), ' '), x -> x <> '') AS l
        |  FROM documents),
        |tok AS (
        |  SELECT l[t.k] AS a, CASE WHEN t.k < len(l) THEN l[t.k + 1] END AS b
        |  FROM w, unnest(range(1, len(l) + 1)) AS t(k)),
        |uni AS (SELECT a, count(*) AS c FROM tok GROUP BY 1),
        |n AS (SELECT sum(c) AS nt FROM uni),
        |bi AS (SELECT a, b, count(*) AS cab FROM tok
        |       WHERE b IS NOT NULL GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT bi.a AS a, bi.b AS b, CAST(cab AS BIGINT) AS n_ab,
        |       floor(ln(cab * 1.0 * n.nt / (ua.c * 1.0 * ub.c)) * 1e6 + 0.5) / 1e6 AS pmi
        |FROM bi JOIN uni ua ON bi.a = ua.a JOIN uni ub ON bi.b = ub.a CROSS JOIN n
        |ORDER BY pmi DESC, bi.a ASC, bi.b ASC LIMIT 20""".stripMargin,
    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM documents),
        |s AS (
        |  SELECT doc_id, lang,
        |         len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','on'], x))) * 1.0 / nullif(len(w), 0) AS r_en,
        |         len(list_filter(w, x -> list_contains(['el','la','de','que','y','en','un','por'], x))) * 1.0 / nullif(len(w), 0) AS r_es,
        |         len(list_filter(w, x -> list_contains(['der','die','und','das','ein','zu','mit','ist'], x))) * 1.0 / nullif(len(w), 0) AS r_de
        |  FROM t)
        |SELECT doc_id, lang,
        |       floor(r_en * 1000000 + 0.5) / 1000000 AS r_en,
        |       CASE WHEN r_en >= r_es AND r_en >= r_de THEN 'en'
        |            WHEN r_es >= r_de THEN 'es' ELSE 'de' END AS guess
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |       md5(array_to_string(list_sort(list_distinct(string_split(trim(text), ' '))), ' ')) AS fp,
        |       len(list_distinct(string_split(trim(text), ' '))) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_rolling_hash" ->
      """SELECT doc_id,
        |       list_reduce(
        |         [CAST(0 AS BIGINT)] ||
        |         list_transform(list_filter(string_split(trim(text), ' '), t -> t <> ''),
        |           t -> CAST(ascii(t) * 31 + ascii(substr(t, length(t), 1)) * 7 + length(t) AS BIGINT)),
        |         (h, v) -> (h * 131 + v) % 2147483647) AS rh
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        |       len(string_split_regex(trim(text), '\s+')) AS n_ws,
        |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe,
        |       n_chars
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
