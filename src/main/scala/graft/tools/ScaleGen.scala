package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe fixture generator: replicates a driver sf directory k× with
  * shifted keys, so operators can be measured one decade above the largest
  * provided fixture (sf0.1 → "sf1": 6M lineitem / 50k documents / 1M
  * events). Replicated text/embeddings create exact-duplicate groups of
  * size k — a deliberately duplicate-heavy corpus that stresses the dedup
  * candidate-pair paths quadratically per group, the worst realistic shape.
  *
  * Usage: runMain graft.tools.ScaleGen <srcSfDir> <outDir> <k>
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(src, out, kStr) = args
    val k = kStr.toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(t: String, keyShifts: Map[String, Long]): Unit = {
      val base = Tables.table(spark, src, t)
      val copies = (0 until k).map { i =>
        keyShifts.foldLeft(base) { case (df, (c, stride)) =>
          df.withColumn(c, col(c) + lit(i * stride))
        }
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scalegen] $t x$k")
    }

    // facts replicate with shifted keys; dims copy as-is (their cardinality
    // is fixed by the schema's FK ranges)
    replicate("lineitem", Map("l_orderkey" -> 1000000000L))
    replicate("orders", Map("o_orderkey" -> 1000000000L))
    replicate("events", Map("event_id" -> 1000000000L, "user_id" -> 1000000L))
    replicate("documents", Map("doc_id" -> 1000000L))
    replicate("embeddings", Map("vec_id" -> 1000000L))
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      Tables.table(spark, src, t)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    spark.stop()
  }
}
