package graft.rel

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.pround

/** Scalar function families (SURVEY.md §2.8), UDF/UDTF surface (§2.10).
  *
  * Reference evidence: `from_unixtime`/`to_timestamp`/`year`/`month`/`day`
  * (`glue/job_wiki_curate.py:37-40`), `date()` casts + `coalesce`
  * (`upsert_athena_aggregates.py:41-45`), JSON serialize/parse
  * (`kafka/wiki-producer.py:77,96`), `strftime` date formatting
  * (`kafka/wiki-s3-consumer.py:48`).
  *
  * Scale notes (100 TB): all built-in `functions._` here are codegen'd into
  * whole-stage pipelines — no shuffle, no UDF serialization. The one Scala
  * UDF (`udf_scalar`) exists to prove the extension point; its scaladoc
  * states the built-in-first rule (a JVM UDF breaks codegen fusion but not
  * vectorization of the surrounding scan; never put one in a 100-TB hot
  * path when a built-in composition exists).
  */
object ScalarFns extends QueryModule {

  /** F-string family: case, trim, substring, concat_ws, split, regexp. */
  private def strFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        $"doc_id",
        upper(substring($"text", 1, 12)).as("up"),
        concat_ws("-", $"lang", $"source").as("tag"),
        length($"text").cast("long").as("len_chars"),
        length(trim($"text")).cast("long").as("len_trim"),
        size(split($"text", " ")).cast("long").as("n_tokens"),
        regexp_extract($"text", "^([a-z]+)", 1).as("first_word"))
      .orderBy($"doc_id")
  }

  /** F-string family 2: padding, translation, replace, reverse, repeat,
    * split_part. (initcap omitted — absent from the oracle engine.) */
  private def strFuncs2(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        $"doc_id",
        lpad($"lang", 5, "*").as("lp"),
        rpad($"source", 8, "-").as("rp"),
        translate($"lang", "aeiou", "AEIOU").as("tr"),
        regexp_replace($"source", "src", "S").as("rr"),
        reverse($"lang").as("rev"),
        expr("repeat(lang, 2)").as("rep"),
        expr("split_part(source, 'c', 2)").as("sp"))
      .orderBy($"doc_id")
  }

  /** F-date family 2: last_day, quarter, dayofyear, make_date. */
  private def dateFuncs2(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(
        $"event_id",
        last_day($"ts".cast("date")).as("ld"),
        quarter($"ts").cast("long").as("q"),
        dayofyear($"ts").cast("long").as("doy"),
        make_date(year($"ts"), month($"ts"), dayofmonth($"ts")).as("md"))
      .orderBy($"event_id")
  }

  /** F-date family: trunc, extract, diff, add_months, epoch, format. */
  private def dateFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(
        $"event_id",
        to_date($"ts").as("d"),
        date_trunc("month", $"ts").as("mon"),
        year($"ts").cast("long").as("yr"),
        month($"ts").cast("long").as("mo"),
        dayofmonth($"ts").cast("long").as("dd"),
        datediff(to_date($"ts"), lit("2024-01-01").cast("date")).cast("long").as("diff_days"),
        add_months(to_date($"ts"), 2).as("plus2m"),
        unix_micros($"ts".cast("timestamp")).as("us"),
        date_format($"ts", "yyyy-MM-dd").as("ds_str"))
      .orderBy($"event_id")
  }

  /** F-math family: arithmetic, round, abs, power, ln, sqrt, mod. */
  private def mathFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select(
        $"l_orderkey", $"l_linenumber",
        pround($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"), 2).as("charge"),
        pround(abs($"l_discount" - 0.05), 4).as("a"),
        pround(pow($"l_quantity", 2), 1).as("p"),
        pround(log($"l_extendedprice"), 6).as("lg"),
        pround(sqrt($"l_quantity"), 6).as("sq"),
        pmod($"l_orderkey", lit(7)).cast("long").as("m"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** F-array family: higher-order functions over `embeddings.embedding`. */
  private def arrFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sumSq = aggregate(
      $"embedding", lit(0.0),
      (s: Column, x: Column) => s + x.cast("double") * x.cast("double"))
    Tables.embeddings(spark, sfDir)
      .select(
        $"vec_id",
        size($"embedding").cast("long").as("n"),
        pround(element_at($"embedding", 1).cast("double"), 6).as("e1"),
        pround(array_max($"embedding").cast("double"), 6).as("mx"),
        pround(array_min($"embedding").cast("double"), 6).as("mn"),
        pround(sumSq, 6).as("ss"),
        size(filter($"embedding", (x: Column) => x > 0)).cast("long").as("npos"))
      .orderBy($"vec_id")
  }

  /** F-array family 2: slice, flatten, positional lookup (scalar-ized
    * outputs for the oracle hasher). Spark `slice(e, 2, 3)` = DuckDB
    * `e[2:4]` (1-based start + length vs inclusive range). */
  private def arrFuncs2(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select(
        $"vec_id",
        pround(element_at(slice($"embedding", 2, 3), 1).cast("double"), 6).as("s2"),
        size(flatten(array(slice($"embedding", 2, 3), slice($"embedding", 1, 2))))
          .cast("long").as("fl"),
        array_position($"embedding", element_at($"embedding", 5)).as("ap"))
      .orderBy($"vec_id")
  }

  /** F-conditional family: CASE, nvl2, least/greatest. */
  private def condFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select(
        $"l_orderkey", $"l_linenumber",
        greatest($"l_quantity", $"l_discount" * 100).as("g"),
        least($"l_quantity", $"l_tax" * 100).as("l"),
        when($"l_quantity" > 25, "hi").otherwise("lo").as("band"),
        expr("nvl2(l_returnflag, 'has', 'none')").as("nv"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** F-map family: map construction + key/value access. The oracle produces
    * the same VALUES without a map type (equivalent SQL, not same plan). */
  private def mapFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val m = map(lit("type"), $"event_type", lit("uid"), $"user_id".cast("string"))
    Tables.events(spark, sfDir)
      .select(
        $"event_id",
        element_at(m, "type").as("t"),
        element_at(m, "uid").as("uid_str"),
        // scalar-ized for the oracle hasher (array cells are hasher-hostile)
        concat_ws(",", map_keys(m)).as("ks_str"))
      .orderBy($"event_id")
  }

  /** F6 — JSON family: the direct descendant of the reference's JSON
    * handling (`from_json`, `get_json_object`). */
  private def jsonFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(
        $"event_id",
        get_json_object($"props", "$.k").cast("long").as("k1"),
        from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").cast("long").as("k2"),
        get_json_object($"props", "$.missing").isNull.as("no_miss"),
        to_json(struct($"event_id".as("id"))).as("j"))
      .orderBy($"event_id")
  }

  /** X1 — scalar Scala UDF (whitespace token counter). Prefer built-ins in
    * hot paths; this exists to prove the extension point. */
  private def udfScalar(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wordCount = udf((s: String) =>
      if (s == null) 0L else s.trim.split("\\s+").length.toLong)
    Tables.documents(spark, sfDir)
      .select($"doc_id", wordCount($"text").as("n_words"))
      .orderBy($"doc_id")
  }

  /** F-hash family: cryptographic digests (md5 / sha2-256) — the
    * content-addressing primitives the dedup operators build on
    * (`llm.Dedup` uses the same digests for text identity). All codegen'd
    * built-ins; per-row cost, no shuffle. */
  private def hashFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        $"doc_id",
        md5($"text").as("h_md5"),
        sha2($"text", 256).as("h_sha256"),
        sha2(concat($"lang", lit("|"), $"source"), 256).as("h_key"))
      .orderBy($"doc_id")
  }

  /** F-regex family: replace-all, group extract, extract-all count, match
    * predicate. Patterns stay in the RE2 ∩ java.util.regex common dialect so
    * the oracle (DuckDB/RE2) agrees; DuckDB's regexp_replace needs the 'g'
    * flag to match Spark's replace-ALL semantics. */
  private def regexFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        $"doc_id",
        regexp_replace(substring($"text", 1, 40), "[aeiou]", "#").as("rr"),
        regexp_extract($"text", "([a-z]{5,})", 1).as("rx"),
        size(regexp_extract_all($"text", lit("\\ba\\w*"), lit(0)))
          .cast("long").as("na"),
        $"text".rlike("zz").as("m"))
      .orderBy($"doc_id")
  }

  /** F-try family: ANSI-mode error-safe variants. Spark 4 defaults
    * `spark.sql.ansi.enabled=true`, so plain division/cast/index THROW on
    * bad input — `try_divide`/`try_cast`/`try_element_at` are the
    * null-on-error forms a pipeline uses for dirty data. Oracle maps them
    * to nullif-guarded division / TRY_CAST / out-of-bounds list index. */
  private def tryFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(
        $"event_id",
        expr("try_divide(10.0D, user_id % 3)").as("td"),
        expr("try_cast(props AS BIGINT)").as("tc"),
        expr("try_element_at(split(event_type, '_'), 5)").as("te"))
      .orderBy($"event_id")
  }

  /** F-array family 3: higher-order predicates (exists / forall / filter
    * count). CAVEAT, documented on purpose: lambda higher-order functions
    * are CodegenFallback (interpreted) in Spark — fine for a semantics
    * surface, kept OUT of hot paths (see `llm/Dedup` scaladoc for the
    * measured relational rewrites). */
  private def arrFuncs3(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select(
        $"vec_id",
        size(filter($"embedding", x => x > 0.05d)).cast("long").as("n_big"),
        exists($"embedding", x => x > 0.05d).as("any_big"),
        forall($"embedding", x => x <= 0.1d).as("all_small"))
      .orderBy($"vec_id")
  }

  /** X3 — generator / UDTF surface: posexplode over tokenized text. */
  private def genExplode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .filter($"doc_id" < 20)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "word")))
      .select($"doc_id", $"pos".cast("long").as("pos"), $"word")
      .orderBy($"doc_id", $"pos")
  }

  /** CSV scalar surface — from_csv/to_csv, the column-level twin of the
    * json/xml families: build a CSV line relationally, parse it back with
    * a DDL schema, and render a struct out. Oracle recomputes from base
    * columns, proving parse(build(x)) == x per row. */
  private def csvFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .withColumn("c", concat_ws(",", $"event_id", $"event_type", $"user_id"))
      .withColumn("p", expr("from_csv(c, 'id BIGINT, t STRING, u BIGINT')"))
      .select(
        $"event_id",
        $"p.t".as("ft"),
        $"p.u".as("fu"),
        to_csv(struct($"event_id".as("id"), $"event_type".as("t"))).as("tc"))
      .orderBy($"event_id")
  }

  /** ANSI interval arithmetic + calendar navigation: day differences,
    * day-time and year-month interval shifts, ISO week truncation/number.
    * (timestampdiff's complete-unit semantics differ from DuckDB's
    * boundary-crossing date_diff, so the oracle-checked surface sticks to
    * the operations both engines define identically.) */
  private def intervalFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(
        $"event_id",
        datediff(to_date($"ts"), lit("2024-01-01").cast("date")).cast("long").as("dd"),
        ($"ts" + expr("INTERVAL 3 DAYS 4 HOURS")).as("ta"),
        ($"ts" - expr("INTERVAL 1 MONTH")).as("tm"),
        date_trunc("week", $"ts").as("wk"),
        weekofyear($"ts").cast("long").as("woy"))
      .orderBy($"event_id")
  }

  /** Spark 4 COLLATION support: case-insensitive equality and prefix
    * matching under UTF8_LCASE, against a mixed-case column synthesized
    * from the corpus (the fixture is all-lowercase). The oracle emulates
    * the collation with lower() — proving the collated comparisons have
    * exactly case-fold semantics. */
  private def strCollation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("mix",
        when(pmod($"doc_id", lit(2)) === 0, upper($"lang")).otherwise($"lang"))
      .select(
        $"doc_id", $"mix",
        expr("mix COLLATE UTF8_LCASE = 'eN'").as("eq_ci"),
        expr("startswith(mix COLLATE UTF8_LCASE, 'E')").as("sw_ci"))
      .orderBy($"doc_id")
  }

  /** X3b — the stack() generator: row-pivots a fixed column list into
    * (key, value) rows, the unpivot primitive for hand-listed columns
    * (agg_unpivot covers the DataFrame unpivot API; this is the SQL
    * generator form). Map-side, no shuffle before the sort. */
  private def genStack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        expr("stack(2, 'lang', lang, 'source', source)").as(Seq("k", "v")))
      .orderBy($"doc_id", $"k")
  }

  /** `inline` — the struct-array generator (stack's typed sibling): each
    * lineitem expands row-locally into three (kind, amount) charge rows
    * (gross / discounted / tax-charged), then one partial+final agg per
    * kind. The generator runs inside the scan's codegen stage — the
    * expansion never shuffles raw rows, only the 3-row aggregate states. */
  private def genInline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // charge amounts as EXACT BIGINTs in 1e-6-dollar units (prices,
    // discounts and tax are 2-decimal by construction), so every group
    // total is an order-independent integer sum — the double form's
    // accumulation noise crossed the 0.01 rounding quantum at the 100×
    // replica volume (60M rows; same class as aggMulti / tpch q9)
    Tables.lineitemSpread(spark, sfDir)
      .select(expr(
        "inline(array(" +
          "struct('gross' AS kind," +
          " CAST(round(l_extendedprice * 100) AS BIGINT) * 10000 AS amt), " +
          "struct('disc' AS kind," +
          " CAST(round(l_extendedprice * 100) AS BIGINT)" +
          " * (100 - CAST(round(l_discount * 100) AS BIGINT)) * 100 AS amt), " +
          "struct('charged' AS kind," +
          " CAST(round(l_extendedprice * 100) AS BIGINT)" +
          " * (100 - CAST(round(l_discount * 100) AS BIGINT))" +
          " * (100 + CAST(round(l_tax * 100) AS BIGINT)) AS amt)))"))
      .groupBy($"kind")
      .agg(count(lit(1)).as("n"),
        (floor(sum($"amt") / lit(10000.0) + lit(0.5)) / lit(100.0)).as("total"))
      .orderBy($"kind")
  }

  /** X3c — posexplode_OUTER: explode with ordinality that KEEPS parents
    * whose array is empty (one null row) — the outer-join semantics of
    * generation, needed whenever downstream must not silently drop
    * rows that produced nothing. */
  private def genPosexplodeOuter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        when($"n_chars" < 150, split(trim($"text"), " "))
          .otherwise(array().cast("array<string>")).as("toks"))
      .select($"doc_id", posexplode_outer($"toks").as(Seq("pos", "tok")))
      .withColumn("pos", $"pos".cast("long"))
      .orderBy($"doc_id", $"pos".asc_nulls_first)
  }

  /** XML scalar surface (Spark 4 ships the spark-xml functions built-in):
    * build an XML fragment relationally, parse it back with `from_xml` and
    * the `xpath_*` family. The oracle computes the expected values straight
    * from the base columns — a hash match proves parse(build(x)) == x per
    * row. All codegen-adjacent (xpath/from_xml evaluate per row with no
    * shuffle); at 100 TB this is a map stage like any scalar projection. */
  private def xmlFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("x",
        concat(lit("<doc id=\""), $"doc_id", lit("\"><lang>"), $"lang",
          lit("</lang><n>"), $"n_chars", lit("</n></doc>")))
      .select(
        $"doc_id",
        expr("xpath_string(x, '/doc/lang')").as("xl"),
        expr("xpath_long(x, '/doc/n')").as("xn"),
        expr("xpath_string(x, '/doc/@id')").as("xid"),
        expr("from_xml(x, 'lang STRING, n BIGINT').lang").as("fl"),
        expr("from_xml(x, 'lang STRING, n BIGINT').n").as("fn"))
      .orderBy($"doc_id")
  }

  /** URL scalar surface: parse_url component extraction plus the
    * url_encode/url_decode round-trip, over a URL synthesized from event
    * columns (the fixture carries no URL column; the reference's SSE feed
    * is wiki page URLs). */
  private def urlFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .withColumn("url",
        concat(lit("https://graft.example.org/wiki/page_"), $"event_id",
          lit("?type="), $"event_type", lit("&u="), $"user_id"))
      .withColumn("raw", concat($"event_type", lit(" a/b")))
      .select(
        $"event_id",
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY')").as("query"),
        expr("parse_url(url, 'QUERY', 'u')").as("qu"),
        expr("url_encode(raw)").as("enc"),
        expr("url_decode(url_encode(raw))").as("dec"))
      .orderBy($"event_id")
  }

  override def queries: Map[String, QueryFn] = Map(
    "str_funcs"  -> strFuncs,
    "str_funcs2" -> strFuncs2,
    "date_funcs" -> dateFuncs,
    "date_funcs2" -> dateFuncs2,
    "math_funcs" -> mathFuncs,
    "arr_funcs"  -> arrFuncs,
    "arr_funcs2" -> arrFuncs2,
    "cond_funcs" -> condFuncs,
    "map_funcs"  -> mapFuncs,
    "json_funcs" -> jsonFuncs,
    "udf_scalar" -> udfScalar,
    "gen_explode" -> genExplode,
    "hash_funcs" -> hashFuncs,
    "regex_funcs" -> regexFuncs,
    "try_funcs" -> tryFuncs,
    "arr_funcs3" -> arrFuncs3,
    "xml_funcs" -> xmlFuncs,
    "url_funcs" -> urlFuncs,
    "gen_stack" -> genStack,
    "gen_inline" -> genInline,
    "gen_posexplode_outer" -> genPosexplodeOuter,
    "interval_funcs" -> intervalFuncs,
    "str_collation" -> strCollation,
    "csv_funcs" -> csvFuncs
  )

  override def oracles: Map[String, String] = Map(
    "csv_funcs" ->
      """SELECT event_id,
        |       event_type AS ft,
        |       user_id AS fu,
        |       CAST(event_id AS VARCHAR) || ',' || event_type AS tc
        |FROM events ORDER BY event_id""".stripMargin,
    "interval_funcs" ->
      """SELECT event_id,
        |       date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dd,
        |       ts + INTERVAL 3 DAY + INTERVAL 4 HOUR AS ta,
        |       ts - INTERVAL 1 MONTH AS tm,
        |       CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk,
        |       weekofyear(ts) AS woy
        |FROM events ORDER BY event_id""".stripMargin,
    "str_collation" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS mix,
        |       lower(CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END) = 'en' AS eq_ci,
        |       lower(CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END) LIKE 'e%' AS sw_ci
        |FROM documents ORDER BY doc_id""".stripMargin,
    "gen_inline" ->
      """SELECT kind, count(*) AS n,
        |       floor(CAST(sum(amt) AS BIGINT) / 10000.0 + 0.5) / 100.0 AS total
        |FROM (
        |  SELECT 'gross' AS kind,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) * 10000 AS amt
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'disc', CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT)) * 100 FROM lineitem
        |  UNION ALL
        |  SELECT 'charged', CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |    * (100 + CAST(round(l_tax * 100) AS BIGINT)) FROM lineitem)
        |GROUP BY kind ORDER BY kind""".stripMargin,
    "gen_stack" ->
      """SELECT doc_id, k, v FROM (
        |  SELECT doc_id, 'lang' AS k, lang AS v FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'source' AS k, source AS v FROM documents)
        |ORDER BY doc_id, k""".stripMargin,
    "gen_posexplode_outer" ->
      """SELECT doc_id, pos, tok FROM (
        |  SELECT doc_id,
        |         CAST(unnest(range(len(string_split(trim(text), ' ')))) AS BIGINT) AS pos,
        |         unnest(string_split(trim(text), ' ')) AS tok
        |  FROM documents WHERE n_chars < 150
        |  UNION ALL
        |  SELECT doc_id, NULL, NULL FROM documents WHERE n_chars >= 150)
        |ORDER BY doc_id, pos ASC NULLS FIRST""".stripMargin,
    "xml_funcs" ->
      """SELECT doc_id,
        |       lang AS xl,
        |       n_chars AS xn,
        |       CAST(doc_id AS VARCHAR) AS xid,
        |       lang AS fl,
        |       n_chars AS fn
        |FROM documents ORDER BY doc_id""".stripMargin,
    "url_funcs" ->
      """SELECT event_id,
        |       'graft.example.org' AS host,
        |       '/wiki/page_' || CAST(event_id AS VARCHAR) AS path,
        |       'type=' || event_type || '&u=' || CAST(user_id AS VARCHAR) AS query,
        |       CAST(user_id AS VARCHAR) AS qu,
        |       replace(replace(event_type || ' a/b', ' ', '+'), '/', '%2F') AS enc,
        |       event_type || ' a/b' AS dec
        |FROM events ORDER BY event_id""".stripMargin,
    "str_funcs" ->
      """SELECT doc_id,
        |       upper(substr(text, 1, 12)) AS up,
        |       concat_ws('-', lang, source) AS tag,
        |       length(text) AS len_chars,
        |       length(trim(text)) AS len_trim,
        |       len(string_split(text, ' ')) AS n_tokens,
        |       regexp_extract(text, '^([a-z]+)', 1) AS first_word
        |FROM documents ORDER BY doc_id""".stripMargin,
    "str_funcs2" ->
      """SELECT doc_id,
        |       lpad(lang, 5, '*') AS lp,
        |       rpad(source, 8, '-') AS rp,
        |       translate(lang, 'aeiou', 'AEIOU') AS tr,
        |       regexp_replace(source, 'src', 'S') AS rr,
        |       reverse(lang) AS rev,
        |       repeat(lang, 2) AS rep,
        |       split_part(source, 'c', 2) AS sp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "date_funcs2" ->
      """SELECT event_id,
        |       last_day(CAST(ts AS DATE)) AS ld,
        |       quarter(ts) AS q,
        |       dayofyear(ts) AS doy,
        |       make_date(CAST(year(ts) AS INT), CAST(month(ts) AS INT), CAST(day(ts) AS INT)) AS md
        |FROM events ORDER BY event_id""".stripMargin,
    "date_funcs" ->
      """SELECT event_id,
        |       CAST(ts AS DATE) AS d,
        |       CAST(date_trunc('month', ts) AS TIMESTAMP) AS mon,
        |       year(ts) AS yr, month(ts) AS mo, day(ts) AS dd,
        |       date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS diff_days,
        |       CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |       epoch_us(ts) AS us,
        |       strftime(ts, '%Y-%m-%d') AS ds_str
        |FROM events ORDER BY event_id""".stripMargin,
    "math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100 AS charge,
        |       floor(abs(l_discount - 0.05) * 10000 + 0.5) / 10000 AS a,
        |       floor(pow(l_quantity, 2) * 10 + 0.5) / 10 AS p,
        |       floor(ln(l_extendedprice) * 1000000 + 0.5) / 1000000 AS lg,
        |       floor(sqrt(l_quantity) * 1000000 + 0.5) / 1000000 AS sq,
        |       l_orderkey % 7 AS m
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "arr_funcs" ->
      """SELECT vec_id,
        |       len(embedding) AS n,
        |       floor(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5) / 1000000 AS e1,
        |       floor(CAST(list_max(embedding) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mx,
        |       floor(CAST(list_min(embedding) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mn,
        |       floor(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS ss,
        |       len(list_filter(embedding, x -> x > 0)) AS npos
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "arr_funcs2" ->
      """SELECT vec_id,
        |       floor(CAST(embedding[2] AS DOUBLE) * 1000000 + 0.5) / 1000000 AS s2,
        |       len(flatten([embedding[2:4], embedding[1:2]])) AS fl,
        |       CAST(list_position(embedding, embedding[5]) AS BIGINT) AS ap
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "cond_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       greatest(l_quantity, l_discount * 100) AS g,
        |       least(l_quantity, l_tax * 100) AS l,
        |       CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END AS band,
        |       CASE WHEN l_returnflag IS NOT NULL THEN 'has' ELSE 'none' END AS nv
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "map_funcs" ->
      """SELECT event_id,
        |       event_type AS t,
        |       CAST(user_id AS VARCHAR) AS uid_str,
        |       'type,uid' AS ks_str
        |FROM events ORDER BY event_id""".stripMargin,
    "json_funcs" ->
      """SELECT event_id,
        |       TRY_CAST(NULLIF(regexp_extract(props, '"k": *(-?\d+)', 1), '') AS BIGINT) AS k1,
        |       TRY_CAST(NULLIF(regexp_extract(props, '"k": *(-?\d+)', 1), '') AS BIGINT) AS k2,
        |       TRUE AS no_miss,
        |       '{"id":' || CAST(event_id AS VARCHAR) || '}' AS j
        |FROM events ORDER BY event_id""".stripMargin,
    "udf_scalar" ->
      """SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_words
        |FROM documents ORDER BY doc_id""".stripMargin,
    "gen_explode" ->
      """SELECT doc_id, pos, word FROM (
        |  SELECT doc_id,
        |         unnest(range(len(string_split(text, ' ')))) AS pos,
        |         unnest(string_split(text, ' ')) AS word
        |  FROM documents WHERE doc_id < 20)
        |ORDER BY doc_id, pos""".stripMargin,
    "hash_funcs" ->
      """SELECT doc_id,
        |       md5(text) AS h_md5,
        |       sha256(text) AS h_sha256,
        |       sha256(lang || '|' || source) AS h_key
        |FROM documents ORDER BY doc_id""".stripMargin,
    "try_funcs" ->
      """SELECT event_id,
        |       10.0 / nullif(user_id % 3, 0) AS td,
        |       TRY_CAST(props AS BIGINT) AS tc,
        |       string_split(event_type, '_')[5] AS te
        |FROM events ORDER BY event_id""".stripMargin,
    "arr_funcs3" ->
      """SELECT vec_id,
        |       len(list_filter(embedding, x -> x > 0.05)) AS n_big,
        |       len(list_filter(embedding, x -> x > 0.05)) > 0 AS any_big,
        |       len(list_filter(embedding, x -> x <= 0.1)) = len(embedding) AS all_small
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "regex_funcs" ->
      """SELECT doc_id,
        |       regexp_replace(substr(text, 1, 40), '[aeiou]', '#', 'g') AS rr,
        |       regexp_extract(text, '([a-z]{5,})', 1) AS rx,
        |       len(regexp_extract_all(text, '\ba\w*')) AS na,
        |       regexp_matches(text, 'zz') AS m
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
