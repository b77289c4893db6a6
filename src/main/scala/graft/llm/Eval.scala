package graft.llm

import graft.{QueryModule, Tables}
import graft.functions.PortableRound.pround
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classifier-evaluation operators over the corpus (north-star extension
  * beside the monitoring tier in [[graft.rel.StatsAggs]]/
  * [[graft.rel.DataQuality]]): before a quality score gates 100 TB of
  * training data you measure how well it separates ([[qualityAuc]]) and
  * whether its probabilities mean anything ([[calibrationBins]]) — the two
  * standard acceptance checks for a filtering model (the reference's
  * pipeline trusts its curation filters blindly, `glue/job_wiki_curate.py:
  * 35-41`; at LLM-corpus scale the filter is a model and gets evaluated
  * like one).
  *
  * Both run on the shared scored frame: score = mean chars-per-token (the
  * deterministic quality proxy `curation_token_budget` ranks by), binary
  * target y = (lang = 'en') — a stand-in labeling; a production run swaps
  * in a trained score column with the plan shape unchanged.
  */
object Eval extends QueryModule {

  /** One slim (score, y) row per doc, one map-side corpus pass. */
  private def scored(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"n_chars", $"lang",
        size(filter(split(trim($"text"), " "), t => t =!= ""))
          .cast("long").as("n_tok"))
      .filter($"n_tok" > 0)
      .select(pround($"n_chars".cast("double") / $"n_tok", 4).as("score"),
        ($"lang" === "en").cast("long").as("y"))
  }

  /** ROC-AUC of the quality score against the binary target, computed as
    * the tie-corrected Mann-Whitney rank statistic:
    * AUC = (Σ_pos midrank − n⁺(n⁺+1)/2) / (n⁺·n⁻), with midranks derived
    * per DISTINCT-SCORE CELL (midrank = rows-below + (cellsize+1)/2), which
    * is exactly the average-rank tie convention — verified cell-form ≡
    * pairwise P(s⁺>s⁻)+½P(s⁺=s⁻) definition.
    *
    * Scale shape (100 TB): one corpus pass partial-aggregates to
    * (score, n, n_pos) cells — bounded by the score's 1e4 quantization,
    * not by rows; rows-below is the distributed prefix sum over cells
    * ([[graft.rel.ScalableRank.withGlobalRunningSum]]); the final reduce is
    * 3 sums over cells. ALL-INTEGER until the single closing division: the
    * statistic is kept ×2 (rank_sum2 = Σ n_pos·(2·below + n + 1)) so no
    * float ever sums across cells — cross-engine equality rides on one
    * division, not on summation order. (Beyond ~3·10⁹ rows promote the
    * ×2 products to DECIMAL(38,0); the shape is unchanged.) */
  private def qualityAuc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = scored(spark, sfDir)
      .groupBy($"score")
      .agg(count(lit(1)).as("n"), sum($"y").as("n_pos"))
    graft.rel.ScalableRank
      .withGlobalRunningSum(cells, $"n", "cum", $"score".asc)
      .agg(sum($"n_pos").as("np"), sum($"n" - $"n_pos").as("nn"),
        sum($"n_pos" * (lit(2) * ($"cum" - $"n") + $"n" + 1)).as("rank_sum2"))
      .select($"np".as("n_pos"), $"nn".as("n_neg"),
        // AUC is undefined on a single-class corpus (np or nn = 0): the
        // 0/0 would surface as NaN — emit NULL, both dialects
        pround(when($"np" > 0 && $"nn" > 0,
          ($"rank_sum2" - $"np" * ($"np" + 1)).cast("double") /
            (lit(2.0) * $"np" * $"nn")), 6).as("auc"))
  }

  /** Reliability diagram: min-max-normalize the score, decile-bin it, and
    * report per bin the count, positives, mean score, and empirical
    * positive rate — the calibration curve read next to [[qualityAuc]]
    * (a well-separating but miscalibrated filter still mis-sizes the kept
    * corpus when thresholded by "probability").
    *
    * Scale shape (100 TB): the slim scored frame pins once
    * ([[graft.rel.Materialize.once]]) and serves both consumers — the
    * 1-row min/max reduce (broadcast back) and the binning aggregation to
    * ≤10 cells. Mean score stays exact: the 1e4-quantized score is summed
    * as an INTEGER (score·1e4 is integral by construction), so only the
    * two closing divisions are floating. */
  private def calibrationBins(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val s = graft.rel.Materialize.once(scored(spark, sfDir))
    val mm = s.agg(min($"score").as("mn"), max($"score").as("mx"))
    s.crossJoin(broadcast(mm))
      // constant-score corpus (mx = mn): the normalization is 0/0 = NaN,
      // which casts to a NULL bin — define it as bin 0, both dialects
      .withColumn("bin",
        when($"mx" > $"mn",
          least(floor(($"score" - $"mn") / ($"mx" - $"mn") * 10), lit(9.0)))
          .otherwise(lit(0.0))
          .cast("long"))
      .withColumn("sc4", floor($"score" * 1e4 + 0.5).cast("long"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"y").as("n_pos"),
        sum($"sc4").as("ssc4"))
      .select($"bin", $"n", $"n_pos",
        pround($"ssc4".cast("double") / ($"n" * 1e4), 6).as("mean_score"),
        pround($"n_pos".cast("double") / $"n", 6).as("frac_pos"))
      .orderBy($"bin")
  }

  /** Confusion matrix of the [[Text.langId]] heuristic against the true
    * `lang` label — the acceptance check for a language-ID gate before it
    * routes 100 TB of documents into per-language pipelines (fasttext's
    * own reporting is exactly this table). One row per observed
    * (true, guess) cell with the within-language rate; the guess space is
    * the heuristic's {en, es, de}, so fr/zh rows expose its blind spots.
    *
    * Scale shape (100 TB): the per-doc guess is [[Text.langId]]'s map
    * pass (Catalyst prunes its unused score columns); ONE partial+final
    * aggregation lands on ≤ |langs|·|guesses| cells and the per-language
    * totals derive from those cells, not from a second corpus scan. */
  private def langidConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Text.langId(spark, sfDir)
      .groupBy($"lang", $"guess").agg(count(lit(1)).as("n"))
    val totals = cells.groupBy($"lang").agg(sum($"n").as("tot"))
    cells.join(broadcast(totals), "lang")
      .select($"lang", $"guess", $"n",
        pround($"n".cast("double") / $"tot", 6).as("frac"))
      .orderBy($"lang", $"guess")
  }

  /** Cohen's kappa (multi-class) of the langid heuristic against the true
    * label — the chance-corrected agreement score that reports "how much
    * better than guessing the marginals" (raw accuracy flatters any
    * classifier on a skewed label mix; kappa is the acceptance number
    * annotation pipelines quote). Closes over the same confusion cells as
    * [[langidConfusion]].
    *
    * Scale shape (100 TB): the corpus is touched by exactly ONE
    * aggregation (the pinned (lang, guess) cell frame — ≤ |langs|·|guesses|
    * rows); observed/expected agreement and the marginal product all
    * derive from cells. Determinism: every sum is an exact integer;
    * po/pe/kappa are the same double op sequence in both engines. */
  private def cohensKappa(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = graft.rel.Materialize.once(
      Text.langId(spark, sfDir)
        .groupBy($"lang", $"guess").agg(count(lit(1)).as("n")))
    val tot = cells.agg(sum($"n").as("nn"),
      sum(when($"lang" === $"guess", $"n")).as("diag"))
    val rowt = cells.groupBy($"lang").agg(sum($"n").as("rt"))
      .select($"lang".as("k"), $"rt")
    val colt = cells.groupBy($"guess").agg(sum($"n").as("ct"))
      .select($"guess".as("k"), $"ct")
    val prod = rowt.join(colt, "k").agg(sum($"rt" * $"ct").as("ps"))
    def po = $"diag".cast("double") / $"nn"
    def pe = $"ps".cast("double") / ($"nn" * $"nn")
    tot.crossJoin(prod).select(
      $"nn".as("n_docs"),
      pround(po, 6).as("po"),
      pround(pe, 6).as("pe"),
      // κ is undefined at pe = 1 (single-label degenerate corpus: the
      // 0/0 would otherwise surface as NaN) — emit NULL, both dialects
      pround(when(pe < 1.0, (po - pe) / (lit(1.0) - pe)), 6).as("kappa"))
  }

  override def queries: Map[String, QueryFn] = Map(
    "eval_quality_auc"      -> qualityAuc,
    "eval_calibration_bins" -> calibrationBins,
    "eval_langid_confusion" -> langidConfusion,
    "eval_cohens_kappa"     -> cohensKappa
  )

  /** Shared scored-frame CTE (identical score quantization and target). */
  private val scoredSql: String =
    """WITH d AS (
      |  SELECT n_chars, lang,
      |    len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS n_tok
      |  FROM documents),
      |s AS (
      |  SELECT floor(CAST(n_chars AS DOUBLE) / n_tok * 1e4 + 0.5) / 1e4 AS score,
      |         CAST(lang = 'en' AS BIGINT) AS y
      |  FROM d WHERE n_tok > 0)""".stripMargin

  /** Shared verbatim replay of text_langid's guess rule (same stopword
    * sets, same >= tie-breaks) — both confusion and kappa close over it,
    * so the two oracles cannot drift apart. */
  private val langGuessSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM documents),
      |s AS (
      |  SELECT lang,
      |         len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','on'], x))) * 1.0 / nullif(len(w), 0) AS r_en,
      |         len(list_filter(w, x -> list_contains(['el','la','de','que','y','en','un','por'], x))) * 1.0 / nullif(len(w), 0) AS r_es,
      |         len(list_filter(w, x -> list_contains(['der','die','und','das','ein','zu','mit','ist'], x))) * 1.0 / nullif(len(w), 0) AS r_de
      |  FROM t),
      |g AS (
      |  SELECT lang,
      |         CASE WHEN r_en >= r_es AND r_en >= r_de THEN 'en'
      |              WHEN r_es >= r_de THEN 'es' ELSE 'de' END AS guess
      |  FROM s)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "eval_langid_confusion" ->
      s"""$langGuessSql,
        |c AS (SELECT lang, guess, count(*) AS n FROM g GROUP BY 1, 2),
        |tot AS (SELECT lang, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.lang AS lang, guess, CAST(n AS BIGINT) AS n,
        |       floor(CAST(n AS DOUBLE) / tot * 1e6 + 0.5) / 1e6 AS frac
        |FROM c JOIN tot ON c.lang = tot.lang
        |ORDER BY lang, guess""".stripMargin,
    // c is MATERIALIZED: the cell frame has four consumers (total, diag,
    // row marginals, column marginals).
    "eval_cohens_kappa" ->
      s"""$langGuessSql,
        |c AS MATERIALIZED (SELECT lang, guess, count(*) AS n FROM g GROUP BY 1, 2),
        |tot AS (SELECT sum(n) AS nn,
        |               sum(CASE WHEN lang = guess THEN n ELSE 0 END) AS diag
        |        FROM c),
        |rt AS (SELECT lang AS k, sum(n) AS rt FROM c GROUP BY 1),
        |ct AS (SELECT guess AS k, sum(n) AS ct FROM c GROUP BY 1),
        |pr AS (SELECT sum(rt.rt * ct.ct) AS ps FROM rt JOIN ct ON rt.k = ct.k)
        |SELECT CAST(nn AS BIGINT) AS n_docs,
        |       floor(CAST(diag AS DOUBLE) / nn * 1e6 + 0.5) / 1e6 AS po,
        |       floor(CAST(ps AS DOUBLE) / (nn * nn) * 1e6 + 0.5) / 1e6 AS pe,
        |       CASE WHEN CAST(ps AS DOUBLE) / (nn * nn) < 1.0 THEN
        |         floor((CAST(diag AS DOUBLE) / nn - CAST(ps AS DOUBLE) / (nn * nn)) /
        |               (1.0 - CAST(ps AS DOUBLE) / (nn * nn)) * 1e6 + 0.5) / 1e6
        |       END AS kappa
        |FROM tot, pr""".stripMargin,
    "eval_quality_auc" ->
      s"""$scoredSql,
         |cells AS (
         |  SELECT score, count(*) AS n, sum(y) AS n_pos FROM s GROUP BY score),
         |r AS (
         |  SELECT n, n_pos,
         |         coalesce(sum(n) OVER (ORDER BY score ASC
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
         |  FROM cells),
         |agg AS (
         |  SELECT sum(n_pos) AS np, sum(n - n_pos) AS nn,
         |         sum(n_pos * (2 * below + n + 1)) AS rank_sum2
         |  FROM r)
         |SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
         |       CASE WHEN np > 0 AND nn > 0 THEN
         |         floor(CAST(rank_sum2 - np * (np + 1) AS DOUBLE) /
         |               (2.0 * np * nn) * 1e6 + 0.5) / 1e6
         |       END AS auc
         |FROM agg""".stripMargin,
    "eval_calibration_bins" ->
      s"""$scoredSql,
         |mm AS (SELECT min(score) AS mn, max(score) AS mx FROM s),
         |b AS (
         |  SELECT CAST(CASE WHEN mx > mn
         |              THEN least(floor((score - mn) / (mx - mn) * 10), 9)
         |              ELSE 0 END AS BIGINT) AS bin,
         |         y, CAST(floor(score * 1e4 + 0.5) AS BIGINT) AS sc4
         |  FROM s, mm)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
         |       floor(CAST(sum(sc4) AS DOUBLE) / (count(*) * 1e4) * 1e6 + 0.5) / 1e6 AS mean_score,
         |       floor(CAST(sum(y) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS frac_pos
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin
  )
}
