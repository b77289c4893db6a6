package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scale-safe replacement for
  * `Window.orderBy(...)` with no partition key, which moves EVERY row to a
  * single partition (Spark itself warns "this can cause serious performance
  * degradation"; at 100 TB it is an OOM, not a slowdown).
  *
  * Pattern (the classic two-phase global sort-rank):
  *   1. `repartitionByRange` on the sort key — one range shuffle, the same
  *      work a distributed ORDER BY does; partitions are ordered by key.
  *   2. Count rows per range partition (partial agg, tiny result).
  *   3. Cumulative-sum those counts into per-partition offsets — a window
  *      over ≤ `shuffle.partitions` rows, bounded by cluster config, never
  *      by data volume.
  *   4. Broadcast-join the offsets back and add a partition-LOCAL
  *      `row_number` — the window partitions by `spark_partition_id()`, so
  *      every group is one range bucket, never the whole table.
  *
  * The global row number is `offset + local row number`, exact regardless of
  * how the range sampler drew partition boundaries. With a tie-free sort key
  * `rank == row_number`, so `percent_rank` and `ntile` follow arithmetically
  * (closed forms below) without ever centralizing the data.
  */
object ScalableRank {

  /** Adds column `rnCol` = 1-based global row number under `sortCols` (which
    * must be a total order — include a unique tiebreaker) and `nCol` = total
    * row count, without a single-partition window. */
  def withGlobalRowNumber(df: DataFrame, rnCol: String, nCol: String,
      sortCols: Column*): DataFrame = {
    // Materialize the range shuffle ONCE: the offsets aggregate and the join
    // probe side below both consume `parts`, and correctness requires they
    // see identical range boundaries and spark_partition_id() assignments.
    // Without this, two independent subplans each re-run repartitionByRange
    // (whose sampler boundaries and AQE coalescing may differ per run) and
    // offsets silently key to the wrong partitions. Materialize.once: both
    // consumers substitute the SAME InMemoryRelation (one materialization,
    // identical pids), and lineage is kept — on block loss the range
    // sampler's deterministic per-partition seeds reproduce the same
    // boundaries, so recompute is safe.
    val parts = Materialize.once(df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id()))
    val counts = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    // ≤ shuffle.partitions rows: the global window here is over partition
    // COUNTS, not data — bounded by cluster config.
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .withColumn(nCol, sum(col("__cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__pid"), col("__off"), col(nCol))
    val localW = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    parts.join(broadcast(offsets), Seq("__pid"))
      .withColumn(rnCol, col("__off") + row_number().over(localW))
      .drop("__pid", "__off")
  }

  /** Adds column `cumCol` = inclusive global running sum of `valueCol` under
    * `sortCols` (a total order), by the same two-phase shape as
    * [[withGlobalRowNumber]]: range shuffle, per-partition SUMS (not counts),
    * tiny cumulative-offset window, broadcast back, partition-local running
    * sum + offset. The only global window runs over ≤ `shuffle.partitions`
    * partial-sum rows — never over data. This is the distributed prefix-sum
    * every sequence-packing / quota-assembly job needs. */
  def withGlobalRunningSum(df: DataFrame, valueCol: Column, cumCol: String,
      sortCols: Column*): DataFrame = {
    // Same materialize-once contract as withGlobalRowNumber: offsets and
    // probe must see identical range boundaries and partition ids.
    val parts = Materialize.once(df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", valueCol))
    val sums = parts.groupBy(col("__pid")).agg(sum(col("__v")).as("__s"))
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sums
      .withColumn("__off", coalesce(sum(col("__s")).over(offW), lit(0L)))
      .select(col("__pid"), col("__off"))
    val localW = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    parts.join(broadcast(offsets), Seq("__pid"))
      .withColumn(cumCol, col("__off") + sum(col("__v")).over(localW))
      .drop("__pid", "__off", "__v")
  }

  /** `ntile(k)` from a global row number: the first `n % k` tiles take
    * `n/k + 1` rows, the rest `n/k` (ANSI semantics, matches Spark/DuckDB). */
  def ntileFromRowNumber(rn: Column, n: Column, k: Int): Column = {
    // Column `/` is floating division; floor() restores integral semantics
    // (exact below 2^53 rows — far past any 100 TB row count).
    val base = floor(n / k)
    val r = n % k
    val cut = r * (base + lit(1L))
    when(base === 0L, rn) // n < k: one row per tile
      .when(rn <= cut, floor((rn - 1) / (base + 1)) + 1)
      .otherwise(r + floor((rn - cut - 1) / base) + 1)
  }

  /** `percent_rank` from a global row number, valid when the sort key is
    * tie-free (then rank == row_number): (rn - 1) / (n - 1). */
  def percentRankFromRowNumber(rn: Column, n: Column): Column =
    when(n === 1L, 0d).otherwise((rn - 1).cast("double") / (n - 1).cast("double"))
}
