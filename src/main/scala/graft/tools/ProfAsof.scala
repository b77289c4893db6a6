package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev micro-bench: native AsOfJoinExec vs the union+window as-of on the
  * same fixture/question (min-of-5 steady-state, noop-write action). */
object ProfAsof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String): Double = {
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }
    // warmup both
    Seq("join_asof", "join_asof_native").foreach(time)
    Seq("join_asof", "join_asof_native", "join_asof", "join_asof_native").foreach { n =>
      println(f"$n%-18s ${time(n)}%.3f s (min of 5)")
    }
    spark.stop()
  }
}
