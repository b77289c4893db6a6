package graft.rel

import graft.{QueryModule, Tables}
import graft.functions.PortableRound.pround
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frequent-itemset mining (market-basket co-occurrence) — the classic
  * corpus-analysis primitive a training-data pipeline runs to find
  * systematically co-occurring items (tags, domains, n-grams, licenses)
  * before sampling decisions. The reference's dashboards stop at per-title
  * counts (wiki_aggregates, `dag/wiki_pipeline_dag.py:29-39`,
  * `README.md:101-106`); this is the pairwise extension over the same
  * grouped-count machinery.
  *
  * Algorithm (A-Priori, Agrawal/Srikant VLDB'94, restricted to pairs —
  * the production sweet spot; triples explode combinatorially and are
  * mined from pair survivors when needed):
  *
  *  1. item-support pass: one groupBy over (basket, item)-distinct rows;
  *     items below `MinItemSupport` are dropped. The A-Priori bound —
  *     a pair is frequent only if BOTH items are — makes this prune
  *     sound, and it is THE scale lever: pair generation cost is
  *     Σ C(k_b, 2) over pruned basket sizes k_b.
  *  2. pair generation INSIDE baskets: baskets collapse to one sorted
  *     item array per basket (single shuffle on the basket key, partial
  *     collect map-side), pairs expand from the array with a nested
  *     `transform`+`slice` — ordered (p1 < p2 by construction), no
  *     self-join, no second exchange of the item rows.
  *  3. pair-support pass: partial-aggregating groupBy on (p1, p2) with
  *     `MinPairSupport` HAVING; lift = support·N / (c1·c2) attaches the
  *     1-row basket count by broadcast cross join (scalar-attach plan).
  *
  * 100-TB shape: two item-row shuffles total (support pass + basket
  * collapse) and one pair shuffle bounded by the A-Priori prune. Skewed
  * giant baskets (a crawl bucket with 10^5 items) are the known hazard:
  * in production the basket is capped to its top-K most-frequent items
  * before expansion (cap >> any real basket here — TPC-H orders hold ≤ 7
  * lines, so the fixture needs no cap and the oracle stays exact).
  * Thresholds are ABSOLUTE support counts calibrated to the fixture
  * (median item support 30 at BOTH sf0.01 and sf0.1 — TPC-H scales the
  * part keyspace with volume, so supports stay constant):
  * `MinItemSupport` 25 prunes a real fraction of items,
  * `MinPairSupport` 2 keeps ~3.4k stable pairs at either SF. Production
  * mining instead uses RELATIVE minsup (support / n_baskets —
  * [[frequentPairsRelOf]] / the declared `mine_frequent_pairs_rel`, whose
  * cutoffs resolve in-plan from the basket count): on a corpus that grows by
  * replication (the 10× probe: fixed keyspace, supports ×10) an absolute
  * threshold admits every pair — output is data-determined, and the
  * probe confirms runtime stays input+output-linear through that regime
  * (4.3 s → 22 s for 10× input / 400× output), which is the invariant
  * that matters at 100 TB.
  */
object Mining extends QueryModule {

  private val MinItemSupport = 25L
  private val MinPairSupport = 2L

  private val MinConfidence = 0.08

  /** Relative (production-form) thresholds: fractions of the basket
    * count. Calibrated to land near the absolute cutoffs at sf0.01
    * (≈15k baskets → item cut ceil(22.5)=23, pair cut ceil(1.95)=2) so
    * the two forms are comparable on the fixture; at a replication-grown
    * corpus these cutoffs scale with nb, which is the scale-safety the
    * absolute form lacks. */
  private val RelItemSupport = 0.0015
  private val RelPairSupport = 0.00013

  /** The distinct (order, part) basket-item set — the input all three
    * declared mining queries derive their supports from, rebuilt
    * identically by each before this pin. Session-lifetime via
    * [[PinnedInputs]] (deterministic in sfDir; two longs per row, ~115k
    * rows at sf0.1): on a production lakehouse the basket table is a
    * materialized ingest product, same argument as the graph family's
    * tradePairs and the minhash signature pins. */
  private def basketItems(spark: SparkSession, sfDir: String): DataFrame =
    PinnedInputs.pinned(spark, sfDir, "mine_baskets") {
      import spark.implicits._
      Tables.lineitem(spark, sfDir)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
    }

  private def frequentPairs(spark: SparkSession, sfDir: String): DataFrame =
    frequentPairsFrom(pairSupportsAbs(spark, sfDir))

  /** Association rules (the second A-Priori stage, Agrawal/Srikant
    * VLDB'94 §1.1): each frequent pair {a, b} yields BOTH directed rules
    * a⇒b and b⇒a with confidence = support({a,b}) / support(antecedent),
    * kept when confidence ≥ [[MinConfidence]]. Lift is direction-free and
    * shared with [[frequentPairs]].
    *
    * 100-TB shape: IDENTICAL to the pair mine (the rule expansion is a
    * map-only 2× of the already-threshold-bounded pair set — no new
    * shuffle, no new scan); confidence/lift derive from the supports the
    * pair pass already carries, so no join back to the item table.
    * Confidence is one double division of exact BIGINT counts → identical
    * bits cross-engine; no rounding tolerance needed, but pround(6) keeps
    * the hash-compare convention. */
  private def assocRules(spark: SparkSession, sfDir: String): DataFrame =
    assocRulesFrom(pairSupportsAbs(spark, sfDir), MinConfidence)

  /** The thresholded pair-support trajectory at the declared ABSOLUTE
    * cutoffs, pinned once per session: both declared absolute-form
    * queries (`mine_frequent_pairs`, `mine_assoc_rules`) project from
    * this one frame — which is also the semantic guarantee the scaladoc
    * promises (rules and pairs use the SAME supports), now enforced by
    * construction. ~3.4k rows at either gate SF; deterministic in sfDir. */
  private def pairSupportsAbs(spark: SparkSession, sfDir: String): DataFrame =
    PinnedInputs.pinned(spark, sfDir, "mine_pair_supports") {
      pairSupportsOf(basketItems(spark, sfDir), MinItemSupport, MinPairSupport)
    }

  /** Rule derivation over [[pairSupportsOf]] — package-visible so tests
    * can drive basket sets with known confidence structure. */
  private[graft] def assocRulesOf(basketsRaw: DataFrame, minItem: Long,
      minPair: Long, minConf: Double): DataFrame =
    assocRulesFrom(pairSupportsOf(basketsRaw, minItem, minPair), minConf)

  private def assocRulesFrom(ps: DataFrame, minConf: Double): DataFrame = {
    import ps.sparkSession.implicits._
    ps
      .select(explode(array(
        struct($"p1".as("antecedent"), $"p2".as("consequent"),
          $"support", $"c1".as("ca"), $"c2".as("cc"), $"n_baskets"),
        struct($"p2".as("antecedent"), $"p1".as("consequent"),
          $"support", $"c2".as("ca"), $"c1".as("cc"), $"n_baskets"))).as("r"))
      .select($"r.*")
      .withColumn("confidence", $"support".cast("double") / $"ca")
      .filter($"confidence" >= minConf)
      .select($"antecedent", $"consequent",
        $"support".cast("bigint").as("support"),
        pround($"confidence", 6).as("confidence"),
        pround($"support" * $"n_baskets" / ($"ca" * $"cc"), 6).as("lift"))
      .orderBy($"antecedent", $"consequent")
  }

  /** A-Priori pair mining over canonical (basket, item)-distinct rows.
    * Package-visible so tests can drive basket sets with known frequent
    * pairs. Output: (p1, p2, support, lift), totally ordered. */
  private[graft] def frequentPairsOf(
      basketsRaw: DataFrame, minItem: Long, minPair: Long): DataFrame =
    frequentPairsFrom(pairSupportsOf(basketsRaw, minItem, minPair))

  private def frequentPairsFrom(ps: DataFrame): DataFrame = {
    import ps.sparkSession.implicits._
    ps.select($"p1", $"p2", $"support".cast("bigint").as("support"),
        pround($"support" * $"n_baskets" / ($"c1" * $"c2"), 6).as("lift"))
      .orderBy($"p1", $"p2")
  }

  /** RELATIVE-minsup production form of the pair mine — the scale-safe
    * variant the absolute-threshold scaladoc above points at: thresholds
    * are fractions of the basket count (item ≥ 0.15 % of baskets, pair ≥
    * 0.013 %), attached DECLARATIVELY from the 1-row basket-count
    * aggregate (broadcast scalar attach — no driver-side action computes
    * the cutoff), so on a corpus that grows by replication the cutoffs
    * grow with it and the output stays distribution-determined instead of
    * admitting every pair. Same two-shuffle A-Priori trajectory as
    * [[frequentPairs]]. */
  private def frequentPairsRel(spark: SparkSession, sfDir: String): DataFrame =
    frequentPairsRelOf(basketItems(spark, sfDir), RelItemSupport, RelPairSupport)

  private[graft] def frequentPairsRelOf(
      basketsRaw: DataFrame, relItem: Double, relPair: Double): DataFrame = {
    import basketsRaw.sparkSession.implicits._
    pairSupportsThresholdedOf(basketsRaw, RelCut(relItem), RelCut(relPair))
      .select($"p1", $"p2", $"support".cast("bigint").as("support"),
        pround($"support" * $"n_baskets" / ($"c1" * $"c2"), 6).as("lift"))
      .orderBy($"p1", $"p2")
  }

  /** Support cutoff: a constant count, or a fraction of the basket count
    * resolved in-plan (ceil(frac·nb), the nb row attached by broadcast —
    * never a driver action). Absolute cutoffs filter WITHOUT the scalar
    * attach, so the original two-join plan shape is preserved for them. */
  private sealed trait Cut
  private final case class AbsCut(v: Long) extends Cut
  private final case class RelCut(frac: Double) extends Cut

  private def cutFilter(df: DataFrame, countCol: Column, cut: Cut,
      nb: DataFrame): DataFrame = cut match {
    case AbsCut(v) => df.filter(countCol >= v)
    case RelCut(f) =>
      import df.sparkSession.implicits._
      df.crossJoin(broadcast(nb))
        .filter(countCol >= ceil(lit(f) * $"n_baskets"))
        .drop("n_baskets")
  }

  /** Shared pair-support trajectory (both mining queries compose from it,
    * so pairs and rules provably use the SAME supports): columns
    * (p1, p2, support, c1, c2, n_baskets), p1 < p2, thresholds applied. */
  private def pairSupportsOf(
      basketsRaw: DataFrame, minItem: Long, minPair: Long): DataFrame =
    pairSupportsThresholdedOf(basketsRaw, AbsCut(minItem), AbsCut(minPair))

  /** Threshold-generalized core: absolute (constant) and relative
    * (ceil(frac·nb)) cutoff forms share one A-Priori plan trajectory. */
  private def pairSupportsThresholdedOf(basketsRaw: DataFrame,
      minItem: Cut, minPair: Cut): DataFrame = {
    val spark = basketsRaw.sparkSession
    import spark.implicits._
    // three consumers (item-support pass, prune join, basket-count
    // scalar) — pin once so the source scans once, not three times
    val baskets = Materialize.once(basketsRaw)
    val nb = baskets.agg(countDistinct($"ok").as("n_baskets"))
    val freqItems = cutFilter(
      baskets.groupBy($"p").agg(count(lit(1)).as("c")), $"c", minItem, nb)
    // pruned basket rows carry the item's support for the lift term
    val pruned = baskets.join(freqItems, Seq("p"))
    val lists = pruned.groupBy($"ok")
      .agg(sort_array(collect_list(struct($"p", $"c"))).as("it"))
    val pairs = lists.select(explode(expr(
      """flatten(transform(it, (x, i) ->
        |  transform(slice(it, i + 2, size(it)), y ->
        |    struct(x.p AS p1, y.p AS p2, x.c AS c1, y.c AS c2))))""".stripMargin
    )).as("pr")).select($"pr.p1", $"pr.p2", $"pr.c1", $"pr.c2")
    val sup = pairs.groupBy($"p1", $"p2")
      .agg(count(lit(1)).as("support"),
        max($"c1").as("c1"), max($"c2").as("c2")) // constant per key
      .crossJoin(broadcast(nb)) // n_baskets rides along for the lift term
    minPair match {
      case AbsCut(v) => sup.filter($"support" >= v)
      case RelCut(f) => sup.filter($"support" >= ceil(lit(f) * $"n_baskets"))
    }
  }

  /** Sequential-pattern counting over each user's time-ordered event
    * stream — MATCH_RECOGNIZE-lite: the per-user journey collapses to a
    * string of event-type initials (c/e/p/s/v, ordered by ts then
    * event_id — a total order), and adjacency patterns count by exact
    * substring arithmetic ((len − len(remove(seq, pat))) / |pat| — no
    * regex engine, so both dialects count the identical non-overlapping
    * occurrences). Reported: click→purchase and signup→purchase
    * adjacencies, the "did the journey convert immediately" signal next
    * to [[graft.rel.Subqueries]]' funnel (which checks ORDER, this
    * checks ADJACENCY).
    *
    * Scale shape (100 TB): ONE shuffle of (user_id, 1-char initial)
    * pairs — the narrowest possible representation of the stream; the
    * per-user aggregation state is that user's journey string, bounded
    * by per-entity activity exactly like sessionization state. Pattern
    * counting is map-side string math on the aggregated row. */
  private def seqPattern(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def cnt(seq: Column, pat: String): Column =
      ((length(seq) - length(expr(s"replace(seq, '$pat', '')"))) / pat.length)
        .cast("long")
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id",
        substring($"event_type", 1, 1).as("i"))
      .groupBy($"user_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"ts", $"event_id", $"i"))),
          x => x("i")), "").as("seq"))
      .select($"user_id", length($"seq").cast("long").as("seq_len"),
        cnt($"seq", "cp").as("n_click_purchase"),
        cnt($"seq", "sp").as("n_signup_purchase"))
      .orderBy($"user_id")
  }

  override def queries: Map[String, QueryFn] = Map(
    "mine_frequent_pairs"     -> frequentPairs,
    "mine_frequent_pairs_rel" -> frequentPairsRel,
    "mine_assoc_rules"        -> assocRules,
    "mine_seq_pattern"        -> seqPattern
  )

  /** Shared pair-support CTE prefix ending in `s` (p1, p2, support, c1,
    * c2) and `n` (nb) — both oracles compose from it, mirroring
    * [[pairSupportsOf]]. `s` is MATERIALIZED: the rules oracle references
    * it twice (one scan per direction), and DuckDB's CTE inlining would
    * re-evaluate the basket self-join per reference (the round-6
    * embed_pca_power lesson). */
  private val PairSupportCtes: String =
    s"""WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
       |           FROM lineitem),
       |i AS (SELECT p, count(*) AS c FROM b GROUP BY 1
       |      HAVING count(*) >= $MinItemSupport),
       |pb AS (SELECT b.ok, b.p, i.c FROM b JOIN i USING (p)),
       |pr AS (SELECT x.p AS p1, y.p AS p2, x.c AS c1, y.c AS c2
       |       FROM pb x JOIN pb y ON x.ok = y.ok AND x.p < y.p),
       |s AS MATERIALIZED (
       |      SELECT p1, p2, count(*) AS support,
       |             max(c1) AS c1, max(c2) AS c2
       |      FROM pr GROUP BY 1, 2 HAVING count(*) >= $MinPairSupport),
       |n AS (SELECT count(DISTINCT ok) AS nb FROM b)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "mine_seq_pattern" ->
      """WITH s AS (
        |  SELECT user_id,
        |         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
        |       CAST((length(seq) - length(replace(seq, 'cp', ''))) / 2 AS BIGINT)
        |         AS n_click_purchase,
        |       CAST((length(seq) - length(replace(seq, 'sp', ''))) / 2 AS BIGINT)
        |         AS n_signup_purchase
        |FROM s ORDER BY user_id""".stripMargin,
    "mine_frequent_pairs" -> (PairSupportCtes +
      """
        |SELECT p1, p2, CAST(support AS BIGINT) AS support,
        |       floor(support * nb * 1.0 / (c1 * c2) * 1e6 + 0.5) / 1e6
        |         AS lift
        |FROM s CROSS JOIN n ORDER BY p1, p2""".stripMargin),
    // relative form: cutoffs derive from nb; the rel literals are CAST to
    // DOUBLE so DuckDB's decimal-exact rel*nb (e.g. 0.0015*2000 = 3.0
    // exact) can't ceil one below Spark's double product (3.0000…0006 → 4)
    "mine_frequent_pairs_rel" ->
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
         |           FROM lineitem),
         |n AS (SELECT count(DISTINCT ok) AS nb FROM b),
         |i AS (SELECT p, c FROM (SELECT p, count(*) AS c FROM b GROUP BY 1)
         |      CROSS JOIN n
         |      WHERE c >= ceil(CAST($RelItemSupport AS DOUBLE) * nb)),
         |pb AS (SELECT b.ok, b.p, i.c FROM b JOIN i USING (p)),
         |pr AS (SELECT x.p AS p1, y.p AS p2, x.c AS c1, y.c AS c2
         |       FROM pb x JOIN pb y ON x.ok = y.ok AND x.p < y.p),
         |s AS (SELECT p1, p2, count(*) AS support,
         |             max(c1) AS c1, max(c2) AS c2
         |      FROM pr GROUP BY 1, 2),
         |f AS (SELECT s.*, nb FROM s CROSS JOIN n
         |      WHERE support >= ceil(CAST($RelPairSupport AS DOUBLE) * nb))
         |SELECT p1, p2, CAST(support AS BIGINT) AS support,
         |       floor(support * nb * 1.0 / (c1 * c2) * 1e6 + 0.5) / 1e6
         |         AS lift
         |FROM f ORDER BY p1, p2""".stripMargin,
    "mine_assoc_rules" -> (PairSupportCtes +
      s""",
         |r AS (SELECT p1 AS antecedent, p2 AS consequent, support,
         |             c1 AS ca, c2 AS cc FROM s
         |      UNION ALL
         |      SELECT p2, p1, support, c2, c1 FROM s)
         |SELECT antecedent, consequent, CAST(support AS BIGINT) AS support,
         |       floor(support * 1.0 / ca * 1e6 + 0.5) / 1e6 AS confidence,
         |       floor(support * nb * 1.0 / (ca * cc) * 1e6 + 0.5) / 1e6
         |         AS lift
         |FROM r CROSS JOIN n
         |WHERE support * 1.0 / ca >= $MinConfidence
         |ORDER BY antecedent, consequent""".stripMargin)
  )
}
