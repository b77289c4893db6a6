package graft.tools
import org.apache.spark.sql.SparkSession
object RunSome {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder.master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .appName("runsome").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keys = args.drop(1)
    keys.foreach { k =>
      val t0 = System.nanoTime
      val df = graft.SparkEntry.queries(k)(spark, sf)
      df.show(8, truncate = false)
      println(s"$k rows=${df.count()} sec=${(System.nanoTime-t0)/1e9}")
    }
    spark.stop()
  }
}
