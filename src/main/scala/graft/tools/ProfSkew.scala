package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Quiet, Tables}

/** AQE skew-join evidence probe (round-10 verdict task 7): the declared
  * star joins dodge the Zipf hot key by broadcasting the dim side, so
  * this probe FORCES the non-broadcast case — a sort-merge fact⋈fact
  * join on the skewed supplier key at the 100×-Zipf corpus (hot supplier
  * ≈ 13% of 60M lineitem rows) — and measures the task-time distribution
  * three ways:
  *
  *   1. `smj_aqe_off`  — plain SMJ, AQE disabled: the hot key lands on
  *      ONE reducer; its task duration is the straggler ceiling.
  *   2. `smj_aqe_skew` — AQE + skew-join splitting: the oversized
  *      partition is split into ~target-size chunks, each joined against
  *      a copy of the matching right rows (no re-shuffle needed for the
  *      downstream partial agg).
  *   3. `salted`       — [[graft.rel.SkewJoin.saltedJoin]] (factor 16) on
  *      top of AQE: the explicit fallback for the shapes AQE can't split
  *      (shuffled-hash joins, extreme single-key skew).
  *
  * The right side is a per-supplier aggregate (~1k rows) deliberately
  * NOT broadcast (merge hint + thresholds off): on a real cluster this
  * is the fact⋈fact case where the build side is too big to ship, which
  * is exactly where skew bites. Per-probe output: wall seconds, join
  * output rows, task count, and the max/p99/p50 task durations of the
  * probe's stages — the straggler evidence.
  *
  * Usage: runMain graft.tools.ProfSkew [sfDir]   (default /tmp/scale100zipf)
  */
object ProfSkew {

  private val taskMs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/scale100zipf")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // make the 256 MB default threshold irrelevant at this corpus: split
      // anything over ~4× the median reducer (the documented knobs a
      // cluster operator would size to executor memory)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16MB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
      // Zipf subtlety: skew DETECTION is relative to the median reducer,
      // and a corpus where MANY keys are hot inflates the median — here
      // the top supplier's partition is ~4.4× the median, under the
      // default skewedPartitionFactor=5, so AQE would silently not split.
      // A cluster operator facing power-law keys must size this knob to
      // the distribution, not trust the default.
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Quiet.storageShutdownRace()
    import spark.implicits._

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null) taskMs.add(e.taskInfo.duration): Unit
    })

    val fact = Tables.lineitem(spark, sfDir)
      .select($"l_suppkey", $"l_quantity", $"l_extendedprice")
    // fact-sized derivation keyed by supplier; ~1k rows but NOT broadcast.
    // Staged to parquet so the join's right child is the canonical
    // scan→shuffle→sort shape: OptimizeSkewedJoin pattern-matches
    // SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) and silently skips a
    // join whose right side still carries its deriving aggregate between
    // the sort and the shuffle — a plan-shape subtlety this probe
    // documents (the first run hit it: skew_split_applied=false with an
    // 11×-median hot partition).
    val perSupp = graft.rel.Materialize.snapshot(
      fact.groupBy($"l_suppkey".as("r_suppkey"))
        .agg(count(lit(1)).as("supp_rows")))

    def probe(name: String, aqe: Boolean)(df: => DataFrame): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      taskMs.clear()
      val t0 = System.nanoTime()
      val q = df.agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
      val out = q.collect()(0).getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      // plan-level evidence that the skew split actually fired: the final
      // adaptive SMJ node carries the isSkew flag
      val skewApplied = q.queryExecution.executedPlan.toString.contains("skewed")
      val ds = taskMs.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      def pct(p: Double) = if (ds.isEmpty) 0L else ds(((ds.length - 1) * p).toInt)
      println(f"""{"probe":"$name","aqe":$aqe,"skew_split_applied":$skewApplied,""" +
        f""""sec":$sec%.2f,"join_rows":$out,""" +
        f""""tasks":${ds.length},"task_ms_max":${ds.lastOption.getOrElse(0L)},""" +
        f""""task_ms_p99":${pct(0.99)},"task_ms_p50":${pct(0.5)}}""")
    }

    def smj = fact.join(perSupp.hint("merge"), $"l_suppkey" === $"r_suppkey")

    probe("smj_aqe_off", aqe = false)(smj)
    // isolate the skew-SPLIT contribution from AQE's generic coalescing
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    probe("smj_aqe_noskewsplit", aqe = true)(smj)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    probe("smj_aqe_skew", aqe = true)(smj)
    probe("salted_aqe_on", aqe = true)(
      graft.rel.SkewJoin.saltedJoin(fact, perSupp, "l_suppkey", "r_suppkey", 16))

    // context: how hot IS the hot key here?
    val top = fact.groupBy($"l_suppkey").count().orderBy($"count".desc).limit(3).collect()
    val total = fact.count()
    println(s"""{"hot_keys":[${top.map(r => s"""{"k":${r.getLong(0)},"rows":${r.getLong(1)}}""").mkString(",")}],"total_rows":$total}""")
    spark.stop()
  }
}
