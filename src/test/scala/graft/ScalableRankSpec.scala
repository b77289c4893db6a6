package graft

import graft.rel.ScalableRank._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed global-rank pattern must be value-identical to the
  * single-partition window it replaces (`rel/Windows.scala` win_ntile), for
  * every k and for n both above and below k. */
class ScalableRankSpec extends SparkSpec {

  private def checkAgainstGlobalWindow(n: Long, k: Int): Unit = {
    import spark.implicits._
    // deterministic scrambled keys, several per partition, with n possibly < k
    val df = spark.range(n).select(
      $"id".as("pk"), pmod($"id" * 7919 + 13, lit(104729)).as("key"))
    val got = withGlobalRowNumber(df, "rn", "n", $"key".asc, $"pk".asc)
      .withColumn("tile", ntileFromRowNumber($"rn", $"n", k))
      .withColumn("pr", percentRankFromRowNumber($"rn", $"n"))
      .select($"pk", $"rn", $"tile", $"pr")
    val w = Window.orderBy($"key".asc, $"pk".asc)
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("tile", ntile(k).over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .select($"pk", $"rn", $"tile", $"pr")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"mismatch at n=$n k=$k")
  }

  test("global row number / ntile / percent_rank match the window versions") {
    checkAgainstGlobalWindow(1000, 4)
    checkAgainstGlobalWindow(997, 7)   // n not divisible by k
    checkAgainstGlobalWindow(3, 8)     // n < k: one row per tile
    checkAgainstGlobalWindow(1, 4)     // percent_rank n=1 edge
  }

  test("global running sum matches the single-partition window version") {
    import spark.implicits._
    val df = spark.range(1000).select(
      $"id".as("pk"), pmod($"id" * 7919 + 13, lit(97)).as("v"))
    val got = withGlobalRunningSum(df, $"v", "cum", $"pk".asc)
      .select($"pk", $"cum")
    val want = df.withColumn("cum", sum($"v").over(
      Window.orderBy($"pk".asc)
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select($"pk", $"cum")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("curation_pack_sequences plan prefixes by range partitions, not one partition") {
    val plan = SparkEntry.queries("curation_pack_sequences")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    // the data-side running sum must partition by the range bucket id —
    // never an unpartitioned sum over the corpus
    assert(plan.contains("windowspecdefinition(__pid"), plan)
  }

  test("win_ntile plan sorts by range partitioning, not a single partition") {
    val plan = SparkEntry.queries("win_ntile")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    // the only SinglePartition exchange allowed is for the tiny per-partition
    // count frame, never for the orders scan side: check no Window sorts the
    // full orders sort keys without a partition spec
    assert(!plan.contains("Window [ntile"), plan)
  }
}
