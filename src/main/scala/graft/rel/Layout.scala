package graft.rel

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) interleaving of two
  * scan dimensions, the clustering trick behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY`.
  *
  * Why it matters at 100 TB: parquet scan pruning runs on per-row-group
  * min/max stats, and a table sorted on ONE column has useless stats on
  * every other column — a `user_id = ?` probe over a time-sorted event
  * table reads everything. Writing the table ordered by the interleaved
  * key (`repartitionByRange(zval)` + `sortWithinPartitions(zval)`) bounds
  * EVERY row group to a small hyper-rectangle in (user, day) space, so
  * row-group stats prune scans on EITHER dimension (or both) — the
  * standard multi-dim clustering result (Morton 1966; Delta's OPTIMIZE
  * implementation is the production reference).
  *
  * The declared query materializes the property the layout relies on
  * rather than file bytes (file listings aren't hashable cross-engine):
  * bucket the z-value into 256 contiguous key ranges — exactly the row
  * groups a range-partitioned z-sorted write would produce — and report
  * each bucket's (user, day) bounding box. The oracle verifies every
  * bucket's box is ≤ 16×2 cells: either-dimension pruning provably works.
  * The z computation itself is 16 integer shift/mask terms, codegen'd,
  * zero-shuffle; the bucket aggregation is one partial+final agg.
  */
object Layout extends QueryModule {

  private val Bits = 8

  /** Morton-interleave two 8-bit ints: x bits at even positions, y at
    * odd. Pure integer shift/mask — bit-identical in any engine. Shared
    * with [[graft.table.GraftTable.zorderBy]], the physical rewrite that
    * actually lays files out in this order. */
  private[graft] def morton(x: Column, y: Column): Column =
    (0 until Bits).map { k =>
      shiftleft(shiftright(x, k).bitwiseAND(lit(1)), 2 * k) +
        shiftleft(shiftright(y, k).bitwiseAND(lit(1)), 2 * k + 1)
    }.reduce(_ + _)

  private def zorderBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .withColumn("z",
        morton(($"user_id" % 256).cast("int"), dayofmonth($"ts")).cast("long"))
      .groupBy(($"z" / 256).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min($"user_id").as("u_min"), max($"user_id").as("u_max"),
        min(dayofmonth($"ts")).cast("long").as("d_min"),
        max(dayofmonth($"ts")).cast("long").as("d_max"))
      .orderBy($"bucket")
  }

  /** Small-file compaction planning — the OTHER half of `OPTIMIZE`
    * (bin-packing) next to [[zorderBuckets]] (clustering). The reference's
    * consumer lands one gzip NDJSON object per Kafka micro-batch
    * (`kafka/wiki-s3-consumer.py:62-90`), the canonical small-files
    * generator: a day of 1-minute batches is 1,440 objects whose footers /
    * list calls dominate scan cost long before data does. Compaction
    * concatenates each partition's batches, in arrival order, into
    * target-sized output files.
    *
    * The declared query materializes the ASSIGNMENT (which micro-batch
    * lands in which output file) rather than file bytes — file listings
    * aren't hashable cross-engine, the plan is. Micro-batch grain here is
    * the hour (the fixture's stand-in for the consumer's batch id);
    * assignment is streaming first-fit in batch order: output index =
    * floor(rows-before-me / target-rows) — exactly what a single pass
    * concatenating batches until the target fills produces. One partial
    * aggregation to batch grain + one linear window per day partition;
    * state is per-day batch counts, never raw rows. The physical rewrite
    * (read + write with this many output files per partition) is
    * exercised in QualityLayoutSpec. */
  private def compactionPlan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val TargetRows = 1024L
    val w = Window.partitionBy($"d").orderBy($"h".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("d"), hour($"ts").cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("cum_before", coalesce(sum($"n_rows").over(w), lit(0L)))
      .select($"d", $"h", $"n_rows",
        floor($"cum_before" / TargetRows).cast("long").as("target_file"))
      .orderBy($"d", $"h")
  }

  override def queries: Map[String, QueryFn] = Map(
    "layout_zorder" -> zorderBuckets,
    "layout_compaction" -> compactionPlan
  )

  override def oracles: Map[String, String] = {
    val z = (0 until Bits).map { k =>
      s"(((x >> $k) & 1) << ${2 * k}) + (((y >> $k) & 1) << ${2 * k + 1})"
    }.mkString(" + ")
    Map(
      "layout_zorder" ->
        s"""WITH d AS (
           |  SELECT user_id, CAST(day(ts) AS INT) AS y,
           |         CAST(user_id % 256 AS INT) AS x
           |  FROM events),
           |z AS (SELECT user_id, y, CAST($z AS BIGINT) AS z FROM d)
           |SELECT CAST(z // 256 AS BIGINT) AS bucket, count(*) AS n,
           |  min(user_id) AS u_min, max(user_id) AS u_max,
           |  CAST(min(y) AS BIGINT) AS d_min, CAST(max(y) AS BIGINT) AS d_max
           |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin,
      "layout_compaction" ->
        """WITH b AS (
          |  SELECT CAST(ts AS DATE) AS d, CAST(hour(ts) AS BIGINT) AS h,
          |         count(*) AS n_rows
          |  FROM events GROUP BY 1, 2),
          |c AS (
          |  SELECT *, coalesce(sum(n_rows) OVER
          |    (PARTITION BY d ORDER BY h
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          |  FROM b)
          |SELECT d, h, n_rows,
          |       CAST(floor(cum_before / 1024) AS BIGINT) AS target_file
          |FROM c ORDER BY d, h""".stripMargin
    )
  }
}
