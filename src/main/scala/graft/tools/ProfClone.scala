package graft.tools

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured probe for shallow clone: pinning a snapshot must cost
  * METADATA, not data. Clones a 2M-row / 64-file table and reports the
  * wall time and bytes landed under the clone root versus a deep-copy
  * control (CTAS of the same snapshot), plus read parity.
  * Run: `runMain graft.tools.ProfClone [nRows] [nFiles]`. */
object ProfClone {

  private def walkBytes(f: File): Long =
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walkBytes).sum
    else f.length()

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

    val base = s"${sys.props("java.io.tmpdir")}/graft_profclone_${ProcessHandle.current.pid}"
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new File(base))
    val df = spark.range(nRows).toDF("id")
      .withColumn("v", ($"id" * 7).cast("long"))
      .withColumn("s", concat(lit("payload-"), $"id"))
      .repartitionByRange(nFiles, $"id")
    val src = graft.table.GraftTable.create(spark, s"$base/src", df)
    val srcBytes = walkBytes(new File(s"$base/src"))

    val c0 = System.nanoTime()
    val clone = src.cloneTo(s"$base/clone")
    val cloneMs = (System.nanoTime() - c0) / 1000000
    val cloneBytes = walkBytes(new File(s"$base/clone"))

    val d0 = System.nanoTime()
    graft.table.GraftTable.create(spark, s"$base/deep", src.read())
    val deepMs = (System.nanoTime() - d0) / 1000000
    val deepBytes = walkBytes(new File(s"$base/deep"))

    require(clone.read().count() == nRows, "clone read parity")
    println(f"""{"probe":"clone","rows":$nRows,"files":$nFiles,""" +
      f""""src_bytes":$srcBytes,"clone_bytes":$cloneBytes,"deep_bytes":$deepBytes,""" +
      f""""clone_ms":$cloneMs,"deep_copy_ms":$deepMs,""" +
      f""""bytes_ratio":${deepBytes.toDouble / math.max(1L, cloneBytes)}%.0f,""" +
      f""""time_ratio":${deepMs.toDouble / math.max(1L, cloneMs)}%.0f}""")
    spark.stop()
  }
}
