package graft.tools
import org.apache.spark.sql.SparkSession
object MineCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args; k <- Seq("mine_frequent_pairs", "mine_frequent_pairs_rel"))
      println(s"$dir $k rows=${graft.SparkEntry.queries(k)(spark, dir).count()}")
    spark.stop()
  }
}
