package graft.tools

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Quiet, Tables}
import graft.table.GraftTable
import graft.upsert.KeepLatest

/** Copy-on-write merge write-amplification probe (round-11 verdict task 1):
  * proves that a GraftTable merge's BYTES WRITTEN scale with the batch,
  * not the table — the property that makes a daily upsert on a 100-TB
  * table a ~0.1%-of-table rewrite instead of a daily 100-TB rewrite.
  *
  * Setup: a keep-latest events table, range-clustered on the merge key
  * (user_id) into 64 files — the layout any maintained upsert table
  * converges to (zorder/compact cluster on the merge key precisely so
  * that merges prune). Probe: upsert a batch touching only the lowest
  * ~BATCH_PCT of the user_id space, then report, from the MANIFESTS alone:
  *
  *   - files/bytes of the parent snapshot
  *   - files carried by reference (path-identical, zero IO)
  *   - files rewritten + new bytes written
  *   - write amplification = bytes written / batch bytes
  *
  * A full-rewrite merge (the pre-round-12 form) is measured alongside as
  * the control: its bytes written ≈ the whole table, every merge.
  *
  * Usage: runMain graft.tools.ProfMerge [sfDir]   (default /root/testdata/sf0.1)
  */
object ProfMerge {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Quiet.storageShutdownRace()
    import spark.implicits._

    val keys = Seq("user_id", "event_type")
    val ord = Seq($"ts".desc, $"event_id".desc)
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"event_id", $"ts", $"value")

    // key-unique base, range-clustered on the merge key into 64 files
    val base = KeepLatest.keepLatest(ev, keys, ord)
      .repartitionByRange(64, $"user_id")
    val root = s"${sys.props("java.io.tmpdir")}/graft_profmerge_${ProcessHandle.current.pid}"
    delete(new File(root))
    val t = GraftTable.create(spark, root, base)
    val v1 = t.commitAt(1)
    val tableBytes = v1.files.map(f => new File(s"$root/${f.path}").length()).sum

    // the day's batch: fresh rows for the lowest ~2% of the user space
    val maxU = ev.agg(max($"user_id")).as[Long].head()
    val cutU = math.max(1L, maxU / 50)
    val batch = ev.filter($"user_id" <= cutU)
      .withColumn("ts", $"ts" + expr("INTERVAL 365 DAYS"))
      .withColumn("value", $"value" + 1.0)
    val batchRows = batch.count()

    val t0 = System.nanoTime()
    t.upsertKeepLatest(batch, keys, ord)
    val cowSec = (System.nanoTime() - t0) / 1e9
    val v2 = t.commitAt(2)
    val v1Paths = v1.files.map(_.path).toSet
    val carried = v2.files.filter(f => v1Paths.contains(f.path))
    val written = v2.files.filterNot(f => v1Paths.contains(f.path))
    val writtenBytes = written.map(f => new File(s"$root/${f.path}").length()).sum

    // control: the pre-COW full-union rewrite of the same merge
    val t1 = System.nanoTime()
    val fullRoot = s"${root}_full"
    delete(new File(fullRoot))
    val tf = GraftTable.create(spark, fullRoot,
      KeepLatest.keepLatest(t.read(1).unionByName(batch), keys, ord))
    val fullSec = (System.nanoTime() - t1) / 1e9
    val fullBytes = tf.commitAt(1).files
      .map(f => new File(s"$fullRoot/${f.path}").length()).sum

    // COW result must equal the control snapshot (cell-exact)
    val diff = t.read(2).exceptAll(tf.read(1)).count() +
      tf.read(1).exceptAll(t.read(2)).count()

    // GENERATION SWEEP: five more daily batches over rotating 2% key
    // slices. Because merge output is range-clustered on the key
    // (clusterForWrite), write amplification must stay flat across
    // generations — without it, each merge's hash-partitioned output
    // would span the whole touched region and be re-rewritten by every
    // subsequent overlapping merge.
    val genStats = (1 to 5).map { g =>
      // 2%-wide slices STEPPING 1%: each generation half-overlaps the
      // previous one's rewrite — the shape that re-rewrites unclustered
      // merge output every time
      val loU = g.toLong * maxU / 100
      val hiU = (g.toLong + 2L) * maxU / 100
      val gBatch = ev.filter($"user_id" > loU && $"user_id" <= hiU)
        .withColumn("ts", $"ts" + expr(s"INTERVAL ${365 + g} DAYS"))
        .withColumn("value", $"value" + g)
      val parentC = t.commitAt(t.latestVersion)
      t.upsertKeepLatest(gBatch, keys, ord)
      val cNew = t.commitAt(t.latestVersion)
      val prevPaths = parentC.files.map(_.path).toSet
      val written = cNew.files.filterNot(f => prevPaths.contains(f.path))
      val bytes = written.map(f => new File(s"$root/${f.path}").length()).sum
      (written.size, bytes, parentC.files.size)
    }
    val genStr = genStats.zipWithIndex.map { case ((nf, b, tot), i) =>
      f"""{"gen":${i + 2},"files_rewritten":$nf,"of":$tot,"bytes":$b}"""
    }.mkString("[", ",", "]")

    println(f"""{"probe":"merge_cow","sf_dir":"$sfDir",
      |"table_files":${v1.files.size},"table_bytes":$tableBytes,
      |"batch_rows":$batchRows,"batch_key_pct":${100.0 / 50}%.1f,
      |"cow_files_rewritten":${v1.files.size - carried.size},
      |"cow_files_carried":${carried.size},
      |"cow_bytes_written":$writtenBytes,
      |"cow_write_pct_of_table":${100.0 * writtenBytes / tableBytes}%.2f,
      |"cow_sec":$cowSec%.2f,
      |"full_rewrite_bytes":$fullBytes,"full_rewrite_sec":$fullSec%.2f,
      |"rows_diverging_from_full":$diff,
      |"generation_sweep":$genStr}""".stripMargin.replaceAll("\n", ""))
    delete(new File(root)); delete(new File(fullRoot))
    spark.stop()
  }

  private def delete(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(delete))
    f.delete(): Unit
  }
}
