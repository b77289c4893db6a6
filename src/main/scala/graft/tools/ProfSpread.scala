package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: is heavy per-row map work serialized by the fixture's one-row-
  * group parquet layout (row groups are atomic scan splits, so the scan
  * stage runs single-task no matter the core count), and does an explicit
  * spread (hash repartition on the row key) after the read fix it?
  * Guide §2.5's "input skew: one huge unsplittable file" case, measured.
  *
  * Run: sbt "runMain graft.tools.ProfSpread /root/testdata/sf0.1"
  */
object ProfSpread {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables.documents(spark, sfDir)
    println(s"[spread] documents scan partitions: ${docs.rdd.getNumPartitions}")
    println(s"[spread] events    scan partitions: ${Tables.events(spark, sfDir).rdd.getNumPartitions}")
    println(s"[spread] lineitem  scan partitions: ${Tables.lineitem(spark, sfDir).rdd.getNumPartitions}")

    // the simhash-wide signature aggregation, as-is vs spread
    def sigs(d: org.apache.spark.sql.DataFrame) = {
      val tokens = d
        .select($"doc_id", explode(split(trim($"text"), " ")).as("w"))
        .withColumn("h1", conv(substring(md5($"w"), 1, 15), 16, 10).cast("long"))
        .withColumn("h2", conv(substring(md5($"w"), 17, 15), 16, 10).cast("long"))
      def bitSums(h: org.apache.spark.sql.Column, tag: String) = (0 until 60).map(i =>
        sum(when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"$tag$i"))
      tokens.groupBy($"doc_id")
        .agg((bitSums($"h1", "a") ++ bitSums($"h2", "b")).head,
             (bitSums($"h1", "a") ++ bitSums($"h2", "b")).tail: _*)
    }
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[spread] $tag%-22s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("sigs as-is") { sigs(docs).write.format("noop").mode("overwrite").save() }
    time("sigs spread") {
      sigs(docs.repartition(32, $"doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    // dq_constraints-style single-pass aggregate over events
    def cons(d: org.apache.spark.sql.DataFrame) = d.agg(
      sum(($"value".isNull || $"value" < 0 || $"value" > 1000).cast("long")),
      sum(($"value" > 300).cast("long")),
      sum(get_json_object($"props", "$.k").isNull.cast("long")),
      (count(lit(1)) - countDistinct($"event_id")))
    val ev = Tables.events(spark, sfDir)
    time("constraints as-is") { cons(ev).write.format("noop").mode("overwrite").save() }
    time("constraints spread") {
      cons(ev.repartition(32, $"event_id"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
