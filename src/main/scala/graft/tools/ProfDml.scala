package graft.tools

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured probe for merge-on-read DELETE (deletion vectors): the claim
  * is that a small DELETE writes O(deleted rows) bytes — the sidecar
  * vectors — where copy-on-write rewrites every candidate file. Two
  * identical range-clustered tables take the SAME scattered 0.1% DELETE,
  * one with `dvMode = "force"` (vector path) and one with `"off"` (COW
  * control); the probe reports the bytes each commit added under `data/`
  * and the reduction ratio. Run: `runMain graft.tools.ProfDml [nRows] [nFiles]`.
  */
object ProfDml {

  private def walk(f: File): Seq[File] =
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
    else Seq(f)

  private def dataBytes(root: String): Map[String, Long] =
    walk(new File(root, "data")).map(f => f.getAbsolutePath -> f.length()).toMap

  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Quiet.storageShutdownRace()
    import spark.implicits._

    def freshTable(tag: String): graft.table.GraftTable = {
      val root = s"${sys.props("java.io.tmpdir")}/graft_profdml_${ProcessHandle.current.pid}_$tag"
      def rm(f: File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new File(root))
      val df = spark.range(nRows).toDF("id")
        .withColumn("v", ($"id" * 7).cast("long"))
        .withColumn("s", concat(lit("payload-"), $"id"))
        .repartitionByRange(nFiles, $"id")
      graft.table.GraftTable.create(spark, root, df)
    }

    // scattered 0.1%: every 1000th id — touches EVERY file, the shape
    // where COW is maximally expensive and a vector maximally cheap
    val cond = $"id" % 1000 === 0

    def measure(tag: String, dvMode: String): (Long, Long, String) = {
      val t = freshTable(tag)
      val before = dataBytes(t.root)
      val t0 = System.nanoTime()
      t.deleteWhere(cond, dvMode = dvMode)
      val ms = (System.nanoTime() - t0) / 1000000
      val after = dataBytes(t.root)
      val newBytes = after.collect {
        case (p, sz) if !before.contains(p) => sz
      }.sum
      (newBytes, ms, t.commitAt(t.latestVersion).operation)
    }

    val (dvBytes, dvMs, dvOp) = measure("dv", "force")
    val (cowBytes, cowMs, cowOp) = measure("cow", "off")
    require(dvOp == "delete_dv" && cowOp == "delete", s"unexpected ops: $dvOp/$cowOp")
    val ratio = cowBytes.toDouble / math.max(1L, dvBytes)
    println(f"""{"probe":"dml_dv","rows":$nRows,"files":$nFiles,""" +
      f""""deleted":${nRows / 1000},"dv_bytes":$dvBytes,"cow_bytes":$cowBytes,""" +
      f""""bytes_ratio":$ratio%.1f,"dv_ms":$dvMs,"cow_ms":$cowMs}""")

    // merge-on-read UPDATE: same scattered 0.1%, SET v = v + 1 — the DV
    // path writes the vectors PLUS only the post-image rows; the COW
    // control rewrites every grazed file
    def measureUpd(tag: String, dvMode: String): (Long, Long, String) = {
      val t = freshTable(tag)
      val before = dataBytes(t.root)
      val t0 = System.nanoTime()
      t.updateWhere(Seq("v" -> ($"v" + 1L)), Some(cond), dvMode = dvMode)
      val ms = (System.nanoTime() - t0) / 1000000
      val after = dataBytes(t.root)
      val newBytes = after.collect {
        case (p, sz) if !before.contains(p) => sz
      }.sum
      (newBytes, ms, t.commitAt(t.latestVersion).operation)
    }
    val (udvB, udvMs, udvOp) = measureUpd("udv", "force")
    val (ucowB, ucowMs, ucowOp) = measureUpd("ucow", "off")
    require(udvOp == "update_dv" && ucowOp == "update", s"unexpected ops: $udvOp/$ucowOp")
    println(f"""{"probe":"dml_dv_update","rows":$nRows,"files":$nFiles,""" +
      f""""updated":${nRows / 1000},"dv_bytes":$udvB,"cow_bytes":$ucowB,""" +
      f""""bytes_ratio":${ucowB.toDouble / math.max(1L, udvB)}%.1f,""" +
      f""""dv_ms":$udvMs,"cow_ms":$ucowMs}""")

    // merge-on-read MERGE: a 0.1%-of-keys batch (plus 0.01% inserts) —
    // the DV path appends the batch and vectors the superseded rows;
    // the COW control rewrites every candidate file the keys graze
    def mergeBatch = spark.range(nRows / 1000).toDF("k")
      .select(($"k" * 1000).as("id"), lit(-1L).as("v"),
        concat(lit("merged-"), $"k" * 1000).as("s"))
      .unionByName(spark.range(nRows / 10000).toDF("k")
        .select(($"k" + nRows + 1).as("id"), lit(-2L).as("v"),
          concat(lit("fresh-"), $"k").as("s")))
    def measureMerge(tag: String, dvMode: String): (Long, Long, String) = {
      val t = freshTable(tag)
      val before = dataBytes(t.root)
      val t0 = System.nanoTime()
      t.mergeUpsert(mergeBatch, Seq("id"), dvMode = dvMode)
      val ms = (System.nanoTime() - t0) / 1000000
      val after = dataBytes(t.root)
      val newBytes = after.collect {
        case (p, sz) if !before.contains(p) => sz
      }.sum
      (newBytes, ms, t.commitAt(t.latestVersion).operation)
    }
    val (mdvB, mdvMs, mdvOp) = measureMerge("mdv", "force")
    val (mcowB, mcowMs, mcowOp) = measureMerge("mcow", "off")
    require(mdvOp == "merge_dv" && mcowOp == "merge_upsert",
      s"unexpected ops: $mdvOp/$mcowOp")
    println(f"""{"probe":"dml_dv_merge","rows":$nRows,"files":$nFiles,""" +
      f""""batch":${nRows / 1000 + nRows / 10000},"dv_bytes":$mdvB,"cow_bytes":$mcowB,""" +
      f""""bytes_ratio":${mcowB.toDouble / math.max(1L, mdvB)}%.1f,""" +
      f""""dv_ms":$mdvMs,"cow_ms":$mcowMs}""")

    // READ amplification of merge-on-read: scan the DV'd snapshot (every
    // row pays the broadcast-map mask) vs the same content after
    // compaction materializes the vectors away. Min-of-3 steady state.
    val tr = freshTable("read")
    tr.deleteWhere(cond, dvMode = "force")
    def scanSec(): Double = {
      (1 to 3).map { _ =>
        val s0 = System.nanoTime()
        tr.read().agg(sum($"v")).collect()
        (System.nanoTime() - s0) / 1e9
      }.min
    }
    tr.read().count() // warm
    val dvScan = scanSec()
    tr.compact(nRows / 8)
    tr.read().count() // warm
    val plainScan = scanSec()
    println(f"""{"probe":"dml_dv_read","rows":$nRows,"files":$nFiles,""" +
      f""""dv_masked_scan_sec":$dvScan%.3f,"post_compact_scan_sec":$plainScan%.3f,""" +
      f""""read_amplification":${dvScan / math.max(1e-9, plainScan)}%.2f}""")
    spark.stop()
  }
}
