package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: phase timing of the native MinHash dedup at sf0.1. */
object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.1"
    spark.range(100000).selectExpr("sum(id)").collect()
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $tag%-22s ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    val docs = Tables.documents(spark, sfDir)
    val sh = docs
      .withColumn("w", split(trim($"text"), " "))
      .withColumn("shingles", array_distinct(
        when(size($"w") >= 3,
          expr("transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
          .otherwise($"w")))
      .filter(size($"shingles") > 0)
      .select($"doc_id", $"shingles")
      .withColumn("hs", expr("transform(shingles, s -> xxhash64(s))"))
    t("shingle+hash")(sh.count())
    val sigCols = (0 until 12).map { j =>
      aggregate($"hs", lit(Long.MaxValue), (m, h) => least(m, xxhash64(h, lit(j))))
    }
    val bandCols = (0 until 6).map { bi =>
      struct(lit(bi).as("band"), xxhash64(sigCols.slice(bi*2, bi*2+2): _*).as("bh"))
    }
    val banded = sh.withColumn("bands", array(bandCols: _*))
      .select($"doc_id", explode($"bands").as("b"))
      .select($"doc_id", $"b.band".as("band"), $"b.bh".as("bh"))
    t("banded count")(println("banded=" + banded.count()))
    val bandedC = banded.cache()
    t("banded cache")(bandedC.count())
    val candC = bandedC.select($"band", $"bh", $"doc_id".as("a_id"))
      .join(bandedC.select($"band", $"bh", $"doc_id".as("b_id")), Seq("band", "bh"))
      .filter($"a_id" < $"b_id").select($"a_id", $"b_id").distinct()
    t("candidates cached")(println("candC=" + candC.count()))
    val cand = banded.select($"band", $"bh", $"doc_id".as("a_id"))
      .join(banded.select($"band", $"bh", $"doc_id".as("b_id")), Seq("band", "bh"))
      .filter($"a_id" < $"b_id").select($"a_id", $"b_id").distinct()
    t("candidates")(println("cand=" + cand.count()))
    spark.stop()
  }
}
