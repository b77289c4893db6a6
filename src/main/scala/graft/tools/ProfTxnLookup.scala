package graft.tools

import java.io.File

import org.apache.spark.sql.SparkSession

import graft.Quiet
import graft.table.GraftTable

/** Long-version-history idempotency-lookup probe (round-12 verdict task
  * 5's "Done" evidence): each streaming micro-batch asks the table
  * "what's my last committed batch id?" — pre-round-13 that scanned
  * manifests newest-first (O(versions) JSON reads per micro-batch; a
  * year-old streaming table holds tens of thousands of versions), now it
  * reads the ONE latest manifest's cumulative txn map. Builds a table
  * with many tiny streaming commits, then times the map lookup against
  * the legacy scan replicated inline.
  *
  * Usage: runMain graft.tools.ProfTxnLookup [nVersions] [lookups]
  */
object ProfTxnLookup {

  def main(args: Array[String]): Unit = {
    val nVersions = args.headOption.map(_.toInt).getOrElse(400)
    val lookups = args.drop(1).headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Quiet.storageShutdownRace()

    val root = s"${sys.props("java.io.tmpdir")}/graft_proftxn_${ProcessHandle.current.pid}"
    delete(new File(root))
    val t = GraftTable.create(spark, root, spark.range(2).toDF("id"))
    // the app's marker lands EARLY, then hundreds of other-app commits pile
    // on top — the worst case for the newest-first scan
    t.idempotentAppend(spark.range(2).toDF("id"), "probe_app", 7L)
    (1 to nVersions).foreach(i =>
      t.idempotentAppend(spark.range(2).toDF("id"), s"other_$i", i.toLong))
    val total = t.versions.size

    val t0 = System.nanoTime()
    var got: Option[Long] = None
    (1 to lookups).foreach(_ => got = t.lastCommittedBatch("probe_app"))
    val mapSec = (System.nanoTime() - t0) / 1e9
    require(got.contains(7L), s"map lookup wrong: $got")

    // the pre-round-13 implementation, replicated: newest-first manifest scan
    val t1 = System.nanoTime()
    var legacy: Option[Long] = None
    (1 to lookups).foreach { _ =>
      legacy = t.versions.sorted.reverse.iterator
        .map(v => t.commitAt(v).txn)
        .collectFirst { case Some((app, batch)) if app == "probe_app" => batch }
    }
    val scanSec = (System.nanoTime() - t1) / 1e9
    require(legacy.contains(7L), s"legacy scan wrong: $legacy")

    println(f"""{"probe":"txn_lookup","versions":$total,"lookups":$lookups,
      |"map_sec":$mapSec%.3f,"legacy_scan_sec":$scanSec%.3f,
      |"speedup":${scanSec / mapSec}%.1f}""".stripMargin.replaceAll("\n", ""))
    delete(new File(root))
    spark.stop()
  }

  private def delete(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(delete))
    f.delete(): Unit
  }
}
