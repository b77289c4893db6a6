package graft.rel

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark 4 VARIANT surface (SURVEY.md §2.8 F6 descendant).
  *
  * The reference keeps events as JSON text end-to-end and re-parses at every
  * hop (`kafka/wiki-producer.py:77`, `kafka/wiki-s3-consumer.py:94`,
  * `glue/job_wiki_curate.py:32`). `json_funcs` reproduces that string-path;
  * this module exercises the SCALE path Spark 4 added for the same data: the
  * binary `VARIANT` type. `parse_json` decodes once into a shredded binary
  * encoding; `variant_get` then navigates without re-tokenizing, and the
  * value ships through shuffles in binary. On a 100 TB JSON-heavy corpus,
  * parse-once-navigate-many is the difference between a CPU-bound scan and
  * a memory-bandwidth-bound one.
  *
  * DuckDB has no VARIANT, but the values a path extraction yields are plain
  * typed scalars — the oracle replays with `json_extract` casts, so the
  * hash-match proves the binary path is value-identical to the text path.
  */
object VariantFns extends QueryModule {

  private def variantFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_id", parse_json($"props").as("v"), $"event_type")
      .select(
        $"event_id",
        // typed path extraction from the binary encoding
        variant_get($"v", "$.k", "bigint").as("k_int"),
        variant_get($"v", "$.k", "string").as("k_str"),
        variant_get($"v", "$.k", "double").as("k_dbl"),
        // missing path → NULL, not error
        variant_get($"v", "$.missing", "bigint").isNull.as("no_miss"),
        // arithmetic on the extracted value proves it is a real scalar
        (variant_get($"v", "$.k", "bigint") * 2 + 1).as("k_arith"),
        // malformed input → NULL via try_parse_json, not a task failure
        try_parse_json(concat($"event_type", lit("{not json")))
          .isNull.as("bad_is_null"))
      .orderBy($"event_id")
  }

  override def queries: Map[String, QueryFn] = Map(
    "variant_funcs" -> variantFuncs
  )

  override def oracles: Map[String, String] = Map(
    "variant_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_dbl,
        |  json_extract(props, '$.missing') IS NULL AS no_miss,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 + 1 AS k_arith,
        |  TRUE AS bad_is_null
        |FROM events
        |ORDER BY event_id""".stripMargin
  )
}
