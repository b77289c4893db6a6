package graft

import graft.curate.Curate
import graft.upsert.KeepLatest
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** End-to-end pipeline parity tests (SURVEY.md §5): synthesized raw NDJSON →
  * curate → partitioned parquet → flagship aggregation, partition-layout and
  * pruning assertions, idempotent upsert.
  */
class PipelineSpec extends SparkSpec {
  import SparkSpec.session.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_pipe").toString

  test("curate: gzip NDJSON -> ts/yyyy/mm/dd partitioned parquet (glue parity)") {
    // wiki-event-shaped raw rows incl. the FIXTURES.md edge cases:
    // null bot, missing minor, duplicate id, a UTC-midnight straddle
    val raw = Seq(
      """{"id":1,"type":"edit","title":"A","user":"u1","bot":false,"timestamp":1704067199,"comment":"c","minor":false}""",
      """{"id":2,"type":"edit","title":"B","user":"u2","bot":null,"timestamp":1704103200,"comment":"c"}""",
      """{"id":2,"type":"edit","title":"B","user":"u2","bot":null,"timestamp":1704103200,"comment":"c"}""",
      """{"id":3,"type":"new","title":"C","user":"u3","bot":true,"timestamp":1704153599,"comment":"c","minor":true}""",
      """{"id":4,"type":"edit","title":"C","user":"u3","bot":false,"timestamp":1704153601,"comment":"c","minor":false}""",
      """not valid json at all"""
    )
    val rawDir = tmp()
    raw.toDF("value").coalesce(1)
      .write.mode("overwrite").option("compression", "gzip").text(rawDir)

    val parsed = spark.read
      .schema(graft.schema.WikiSchemas.raw)
      .option("mode", "DROPMALFORMED")
      .json(rawDir)
      .filter($"id".isNotNull)  // malformed-record drop (P5)
      .withColumn("minor", coalesce($"minor", lit(false)))  // producer default (P2)
    val curated = Curate.curateEpoch(parsed)
    val outDir = tmp()
    Curate.writeCurated(curated, outDir, SaveMode.Overwrite)

    // partition layout yyyy=/mm=/dd= exists and splits the midnight straddle
    val d31 = new java.io.File(s"$outDir/yyyy=2023/mm=12/dd=31")
    val d1 = new java.io.File(s"$outDir/yyyy=2024/mm=1/dd=1")
    assert(d31.isDirectory && d1.isDirectory)

    val back = spark.read.parquet(outDir)
    assert(back.count() === 5)  // corrupt row dropped, duplicate kept (at-least-once)
    assert(back.filter($"minor").count() === 1)
    // flagship aggregation over curated output (README.md:101-106 restatement)
    val top = back.groupBy(to_date($"ts").as("ds"), $"title", $"user")
      .agg(count(lit(1)).as("edits"))
      .orderBy($"edits".desc, $"ds", $"title", $"user")
      .collect()
    assert(top.head.getLong(3) === 2)  // the duplicated id=2 rows
  }

  test("observe: quality metrics accumulate during the write, no second scan") {
    val dir = tmp()
    val df = Curate.curateTs(Tables.events(spark, sf).limit(1000))
    val (observed, obs) = Curate.observeQuality(df)
    Curate.writeCurated(observed, s"$dir/out", SaveMode.Overwrite)
    val m = obs.get
    assert(m("n_rows") === 1000L)
    assert(m("n_null_ts") === 0L)
    // events.ts is TIMESTAMP_NTZ (nanos truncated in Tables) → LocalDateTime
    assert(m("min_ts").asInstanceOf[java.time.LocalDateTime]
      .compareTo(m("max_ts").asInstanceOf[java.time.LocalDateTime]) <= 0)
  }

  test("compact: many micro-batch files -> few, rows and partitions intact") {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val dir = tmp()
    // simulate 2 days x 12 micro-batch flushes of tiny files
    val events = spark.range(2400).select(
      $"id",
      (lit(1704067200L) + ($"id" % 2) * 86400 + $"id" % 1000).as("timestamp"))
    Curate.writeCurated(
      Curate.curateEpoch(events.repartition(12)), dir, SaveMode.Overwrite)
    val filesBefore = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    assert(filesBefore >= 20, s"setup should fragment: $filesBefore files")

    // compact ONLY day 1; day 2's fragments must survive untouched
    val (before, after) = Curate.compact(
      spark, dir, partitionFilter = col("dd") === 1)
    assert(before >= 10 && after === 1, s"day-1: $before -> $after files")
    val day2Files = spark.read.parquet(dir).filter($"dd" === 2)
      .select(input_file_name()).distinct().count()
    assert(day2Files >= 10, "untouched partition must keep its files")
    assert(spark.read.parquet(dir).count() === 2400, "no row lost or duplicated")
  }

  test("partition pruning reaches the file listing (PartitionFilters)") {
    val df = SparkEntry.queries("filter_partition_prune")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("(yyyy") || plan.contains("yyyy#")),
      s"expected partition filters in plan:\n$plan")
  }

  test("keep-latest upsert is idempotent and replaces only touched partitions") {
    val base = Seq(
      (1L, "a", 10L, 1, "x"), (2L, "a", 20L, 1, "x"), (3L, "b", 30L, 2, "x"))
      .toDF("id", "k", "v", "pt", "payload")
    val dir = tmp()
    base.write.mode("overwrite").partitionBy("pt").parquet(dir)

    val batch = Seq((2L, "a", 99L, 1, "y"), (4L, "c", 40L, 1, "y"))
      .toDF("id", "k", "v", "pt", "payload")
    val existing = spark.read.parquet(dir).filter($"pt" === 1)
    KeepLatest.upsertPartitions(existing, batch, dir,
      keys = Seq("id"), ordering = Seq($"payload".desc), partitionCols = Seq("pt"))

    val after = spark.read.parquet(dir).orderBy("id")
    assert(after.count() === 4)
    assert(after.filter($"id" === 2L).head.getLong(2) === 99L)  // updated
    assert(after.filter($"id" === 3L).count() === 1)            // untouched partition intact
    // re-run same batch => identical result (idempotent)
    val existing2 = spark.read.parquet(dir).filter($"pt" === 1)
    KeepLatest.upsertPartitions(existing2, batch, dir,
      keys = Seq("id"), ordering = Seq($"payload".desc), partitionCols = Seq("pt"))
    assert(spark.read.parquet(dir).count() === 4)
  }

  test("§3.2 dialect parity: the reference's Athena query text runs verbatim on spark.sql") {
    // README.md:101-106 inspection query, unchanged except `user` quoting
    // (Athena double-quotes identifiers; Spark uses backticks) and the
    // table name. Timestamps are epoch seconds exactly as in the reference.
    val raw = Seq(
      (1L, "edit", "PageA", "alice", false, 1704100000L, "c", false),
      (2L, "edit", "PageA", "alice", false, 1704101000L, "c", false),
      (3L, "edit", "PageB", "bob", false, 1704102000L, "c", false))
      .toDF("id", "type", "title", "user", "bot", "timestamp", "comment", "minor")
    raw.createOrReplaceTempView("curated")
    val out = spark.sql(
      """SELECT date(from_unixtime(timestamp)) AS ds, title, `user`, count(*) AS edits
        |FROM curated
        |GROUP BY 1, 2, 3
        |ORDER BY edits DESC
        |LIMIT 20""".stripMargin).collect()
    assert(out.length === 2)
    assert(out.head.getString(1) === "PageA" && out.head.getLong(3) === 2L)
    assert(out.head.getDate(0).toString === "2024-01-01")
  }

  test("MSCK-equivalent partition discovery: recoverPartitions sees new dirs") {
    val dir = pipeline.PipelineQueries.curatedEventsDir(spark, sf)
    spark.sql("DROP TABLE IF EXISTS graft_curated_ext")
    spark.sql(
      s"CREATE TABLE graft_curated_ext (event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, " +
      s"event_type STRING, value DOUBLE, props STRING, yyyy INT, mm INT, dd INT) " +
      s"USING PARQUET PARTITIONED BY (yyyy, mm, dd) LOCATION '$dir'")
    spark.catalog.recoverPartitions("graft_curated_ext")  // MSCK REPAIR TABLE
    val n = spark.table("graft_curated_ext")
      .filter($"yyyy" === 2024 && $"mm" === 1 && $"dd" === 3).count()
    assert(n > 0)
  }

  test("cdc round-trip: applying the derived changelog to base reproduces next") {
    // derive ∘ apply = identity — the property that makes a changelog a
    // changelog. Rebuild the op's two snapshots, apply its I/U/D output
    // to base, and require exact set equality with next.
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"ts", $"value", $"event_type")
    def latest(df: org.apache.spark.sql.DataFrame) =
      KeepLatest.keepLatest(df, Seq("user_id"), Seq($"ts".desc, $"event_id".desc))
    val base = latest(ev.filter($"ts" < lit("2024-01-02").cast("timestamp")))
      .select($"user_id", $"event_id", $"ts", $"value")
    val nxt = latest(ev).filter($"event_type" =!= "error")
      .select($"user_id", $"event_id", $"ts", $"value")
    val changes = SparkEntry.queries("cdc_derive_changes")(spark, sf)
    assert(changes.select($"op").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("I", "U", "D")))
    val touched = changes.select($"user_id")
    val applied = base.join(touched, Seq("user_id"), "left_anti")
      .unionByName(changes.filter($"op" =!= "D")
        .select($"user_id", $"event_id", $"ts", $"value"))
    assert(applied.exceptAll(nxt).isEmpty && nxt.exceptAll(applied).isEmpty,
      "base + changelog must equal the next snapshot exactly")
  }
}
