package graft.tools

import graft.Tables
import graft.functions.VectorFunctions
import graft.functions.VecDotNative
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: measure the higher-order-function dot product against the
  * native codegen'd expression on the pairwise-join shape (the hot path of
  * `sim_threshold_join`). Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.MicroBench"
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val e = Tables.embeddings(spark, sfDir)
    val a = e.select($"vec_id".as("a_id"), $"label".as("a_label"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("b_id"), $"label".as("b_label"), $"embedding".as("vb"))
    val pairs = a.join(b, $"a_label" === $"b_label" && $"a_id" < $"b_id").cache()
    pairs.count() // materialize the pair set outside timing

    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      // warm once, then best-of-3
      mk.agg(sum($"d")).collect()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.agg(sum($"d")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-28s best=${times.min}%.3fs  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }

    time("hof zip_with+aggregate") {
      pairs.select(VectorFunctions.vec_dot($"va", $"vb").as("d"))
    }
    time("native codegen expression") {
      pairs.select(VecDotNative.vec_dot_native($"va", $"vb").as("d"))
    }
    // cross-check: bit-identical results
    val diff = pairs
      .select((VectorFunctions.vec_dot($"va", $"vb") =!=
        VecDotNative.vec_dot_native($"va", $"vb")).as("ne"))
      .filter($"ne").count()
    println(s"mismatching rows: $diff")
    spark.stop()
  }
}
