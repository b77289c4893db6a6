package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured probe for the bloom file index: a point lookup on a
  * HASH-DISTRIBUTED key column, where every file's min/max range spans
  * the whole domain — stats skipping prunes nothing, so the scan reads
  * all files; the per-file bloom sidecars prune to the files that might
  * hold the key (expected ~1 of N at fpp 1%). Reports the candidate
  * count and the min-of-5 lookup latency with and without the index,
  * plus the index's build time and on-disk size.
  * Run: `runMain graft.tools.ProfBloomIdx [nRows] [nFiles]`. */
object ProfBloomIdx {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Quiet.storageShutdownRace()
    import spark.implicits._

    val root = s"${sys.props("java.io.tmpdir")}/graft_profbloom_${ProcessHandle.current.pid}"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(root))
    // hash layout: ids shuffle across files, every file range ≈ [0, n)
    val df = spark.range(nRows).toDF("id")
      .withColumn("v", ($"id" * 7).cast("long"))
      .repartition(nFiles)
    val t = graft.table.GraftTable.create(spark, root, df)

    val key = nRows / 2
    val eq = Seq(("id", BigDecimal(key), BigDecimal(key)))
    def lookupSec(): Double = (1 to 5).map { _ =>
      val s0 = System.nanoTime()
      spark.read.format("graft").load(root)
        .filter($"id" === key).agg(sum($"v")).collect()
      (System.nanoTime() - s0) / 1e9
    }.min

    val before = t.pruneFiles(1, eq).size
    spark.read.format("graft").load(root).filter($"id" === key).count() // warm
    val secNoIdx = lookupSec()

    val b0 = System.nanoTime()
    val indexed = t.indexBloom("id")
    val buildSec = (System.nanoTime() - b0) / 1e9
    val idxBytes = Option(new java.io.File(root, "_graft_index").listFiles())
      .getOrElse(Array.empty).map(_.length()).sum
    val after = t.pruneFiles(1, eq).size
    val secIdx = lookupSec()

    println(f"""{"probe":"bloom_idx","rows":$nRows,"files":$nFiles,""" +
      f""""files_before":$before,"files_after":$after,"indexed":$indexed,""" +
      f""""build_sec":$buildSec%.2f,"index_bytes":$idxBytes,""" +
      f""""lookup_noidx_sec":$secNoIdx%.3f,"lookup_idx_sec":$secIdx%.3f,""" +
      f""""speedup":${secNoIdx / math.max(1e-9, secIdx)}%.1f}""")
    spark.stop()
  }
}
