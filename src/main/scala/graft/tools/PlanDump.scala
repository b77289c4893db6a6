package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev utility: write `explain("formatted")` of ANY declared query keys to
  * files — the round-15 optimization evidence trail (plans/r15/<key>_<tag>.txt).
  *
  * Run:
  *   sbt "runMain graft.tools.PlanDump <sfDir> <outDir> <tag> key1 key2 ..."
  *
  * Unlike [[ExplainDump]] (stdout, fixed headline list) this accepts any
  * declared key and writes one file per key, so before/after plan diffs are
  * committable artifacts.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <tag> <key>...")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val tag = args(2)
    val keys = args.drop(3).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { name =>
      val df = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query key: $name"))(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$tag.txt"), plan)
      println(s"wrote ${outDir.resolve(s"${name}_$tag.txt")}")
    }
    spark.stop()
  }
}
