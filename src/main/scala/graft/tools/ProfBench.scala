package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Scratch profiler: runs selected declared queries twice in one session to
  * separate one-time (codegen/init) cost from steady-state cost. Usage:
  * runMain graft.tools.ProfBench <sfDir> <query...> */
object ProfBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (n <- names; lap <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[prof] $n lap$lap ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
