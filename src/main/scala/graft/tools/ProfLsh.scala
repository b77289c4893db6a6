package graft.tools

import graft.Tables
import graft.functions.VecDotNative.{vec_dot_native, vec_norm_native}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the sim_threshold_lsh stages: signature pass,
  * candidate join, exact verify — which stage owns the wall time?
  * Usage: runMain graft.tools.ProfLsh <sfDir> */
object ProfLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()

    val rnd = new scala.util.Random(7)
    val planes = Seq.fill(64)(Seq.fill(64)(rnd.nextGaussian().toFloat))
    def bandSig(v: org.apache.spark.sql.Column, bi: Int) =
      (0 until 8).map { j =>
        when(vec_dot_native(v, typedLit(planes(bi * 8 + j))) > 0,
          lit(1L << (7 - j))).otherwise(lit(0L))
      }.reduce(_ + _)

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    }

    // how expensive is the signature pass alone, un-prunable?
    for (lap <- 1 to 2) {
      val e0 = Tables.embeddings(spark, sfDir)
      time(s"lap$lap sig-forced") {
        e0.select((0 until 8).map(bi => bandSig($"embedding", bi).as(s"b$bi")): _*)
          .select(((0 until 8).map(i => col(s"b$i")).reduce(_ + _)).as("s"))
          .agg(sum($"s")).collect(); 0L
      }
      time(s"lap$lap one-band-forced") {
        e0.select(bandSig($"embedding", 0).as("b0"))
          .agg(sum($"b0")).collect(); 0L
      }
      time(s"lap$lap raw-dots-forced") {
        e0.select((0 until 8).map(j =>
            vec_dot_native($"embedding", typedLit(planes(j))).as(s"d$j")): _*)
          .select(((0 until 8).map(i => col(s"d$i")).reduce(_ + _)).as("s"))
          .agg(sum($"s")).collect(); 0L
      }
    }
    for (lap <- 1 to 2) {
      val e = Tables.embeddings(spark, sfDir).withColumn("nrm", vec_norm_native($"embedding"))
      time(s"lap$lap sig-only") {
        e.select($"vec_id" +: (0 until 8).map(bi => bandSig($"embedding", bi).as(s"b$bi")): _*)
          .count()
      }
      val banded = e
        .select($"vec_id" +: (0 until 8).map(bi => bandSig($"embedding", bi).as(s"b$bi")): _*)
        .select($"vec_id", explode(array((0 until 8).map(bi =>
          struct(lit(bi).as("band"), col(s"b$bi").as("bv"))): _*)).as("b"))
        .select($"vec_id", $"b.band".as("band"), $"b.bv".as("bv"))
      val cand = banded.select($"band", $"bv", $"vec_id".as("a_id"))
        .join(banded.select($"band", $"bv", $"vec_id".as("b_id")), Seq("band", "bv"))
        .filter($"a_id" < $"b_id")
        .select($"a_id", $"b_id").distinct()
      time(s"lap$lap sig+cand") { cand.count() }
      if (lap == 1) {
        val preDistinct = banded.select($"band", $"bv", $"vec_id".as("a_id"))
          .join(banded.select($"band", $"bv", $"vec_id".as("b_id")), Seq("band", "bv"))
          .filter($"a_id" < $"b_id")
        time("pre-distinct pairs") { preDistinct.count() }
        val buckets = banded.groupBy($"band", $"bv").count()
          .orderBy($"count".desc).limit(5).collect()
        println("[prof] top buckets: " + buckets.mkString(" "))
      }
      val verified = cand
        .join(e.select($"vec_id".as("a_id"), $"embedding".as("va"), $"nrm".as("na")), Seq("a_id"))
        .join(e.select($"vec_id".as("b_id"), $"embedding".as("vb"), $"nrm".as("nb")), Seq("b_id"))
        .withColumn("cos_sim", vec_dot_native($"va", $"vb") / ($"na" * $"nb"))
        .filter($"cos_sim" >= 0.35)
      time(s"lap$lap full") { verified.count() }
      // variant: materialize the banded signatures once (16k rows), then
      // self-join the checkpointed relation
      val bandedCk = banded.localCheckpoint()
      val candCk = bandedCk.select($"band", $"bv", $"vec_id".as("a_id"))
        .join(bandedCk.select($"band", $"bv", $"vec_id".as("b_id")), Seq("band", "bv"))
        .filter($"a_id" < $"b_id")
        .select($"a_id", $"b_id").distinct()
      val fullCk = candCk
        .join(e.select($"vec_id".as("a_id"), $"embedding".as("va"), $"nrm".as("na")), Seq("a_id"))
        .join(e.select($"vec_id".as("b_id"), $"embedding".as("vb"), $"nrm".as("nb")), Seq("b_id"))
        .withColumn("cos_sim", vec_dot_native($"va", $"vb") / ($"na" * $"nb"))
        .filter($"cos_sim" >= 0.35)
      time(s"lap$lap full-ck") { fullCk.count() }
      bandedCk.unpersist()
    }
    spark.stop()
  }
}
