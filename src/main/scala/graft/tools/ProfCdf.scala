package graft.tools

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Quiet, Tables}
import graft.table.GraftTable
import graft.upsert.KeepLatest

/** Merge-crossing CDF cost probe (round-12 verdict task 4's "Done"
  * evidence): before round 13, `changesBetween` across ANY rewrite fell
  * back to two full-snapshot EXCEPT ALLs — O(2×table) reads however
  * small the merge. The telescoped per-step diff reads only the files
  * the merge ADDED or REMOVED (O(touched) under copy-on-write), then one
  * signed-count shuffle over the churned rows.
  *
  * Setup: a keep-latest events table at the given corpus (default the
  * 100×-Zipf replica — hot keys, the skew shape that stresses the
  * signed-count groupBy), range-clustered on the merge key into 64
  * files; one COW merge touching ~2% of the key space. Probe: time and
  * file-count `changesBetween(1, 2)` (telescoped) against the
  * hand-built snapshot EXCEPT-ALL pair (the old fallback), assert the
  * row multisets agree, and report both.
  *
  * Usage: runMain graft.tools.ProfCdf [sfDir]   (default /tmp/scale100zipf)
  */
object ProfCdf {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/scale100zipf")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Quiet.storageShutdownRace()
    import spark.implicits._

    val keys = Seq("user_id", "event_type")
    val ord = Seq($"ts".desc, $"event_id".desc)
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"event_id", $"ts", $"value")

    val base = KeepLatest.keepLatest(ev, keys, ord)
      .repartitionByRange(64, $"user_id")
    val root = s"${sys.props("java.io.tmpdir")}/graft_profcdf_${ProcessHandle.current.pid}"
    delete(new File(root))
    val t = GraftTable.create(spark, root, base)

    val maxU = ev.agg(max($"user_id")).as[Long].head()
    val batch = ev.filter($"user_id" <= math.max(1L, maxU / 50))
      .withColumn("ts", $"ts" + expr("INTERVAL 365 DAYS"))
      .withColumn("value", $"value" + 1.0)
    t.upsertKeepLatest(batch, keys, ord)

    val v1 = t.commitAt(1); val v2 = t.commitAt(2)
    val v1Paths = v1.files.map(_.path).toSet
    val churned = v2.files.count(f => !v1Paths.contains(f.path)) +
      v1.files.count(f => !v2.files.map(_.path).toSet.contains(f.path))

    val t0 = System.nanoTime()
    val tele = t.changesBetween(1, 2)
    val teleRows = tele.count()
    val teleSec = (System.nanoTime() - t0) / 1e9

    // the pre-round-13 fallback, hand-built: two full-snapshot EXCEPT ALLs
    val t1 = System.nanoTime()
    val snap = t.read(2).exceptAll(t.read(1)).withColumn("_change_type", lit("insert"))
      .unionByName(t.read(1).exceptAll(t.read(2)).withColumn("_change_type", lit("delete")))
    val snapRows = snap.count()
    val snapSec = (System.nanoTime() - t1) / 1e9

    val diverge = tele.exceptAll(snap).count() + snap.exceptAll(tele).count()

    println(f"""{"probe":"cdf_merge_crossing","sf_dir":"$sfDir",
      |"table_files":${v1.files.size},"table_rows":${v1.files.map(_.rows).sum},
      |"files_churned_by_merge":$churned,
      |"telescoped_sec":$teleSec%.2f,"telescoped_rows":$teleRows,
      |"snapshot_diff_sec":$snapSec%.2f,"snapshot_diff_rows":$snapRows,
      |"rows_diverging":$diverge}""".stripMargin.replaceAll("\n", ""))

    // ---- round-14: the SAME window now CROSSES SCHEMA EVOLUTION --------
    // v3 = pure-metadata ADD COLUMNS (zero churn), v4 = a small append
    // carrying the new column. changesBetween(1, 4) must still telescope
    // (O(churn in the window): the merge's files + the appended files),
    // rendered in v4's WIDE schema — before round 14 an evolved range
    // bailed to the two-snapshot fallback, which could not even union the
    // mismatched arities.
    val c2 = t.commitAt(2)
    t.commit(2, "alter_table", c2.files, c2.schema.add("tag", "string"))
    t.append(batch.limit(1000).withColumn("tag", lit("evo")))
    val t2 = System.nanoTime()
    val teleEvo = t.changesBetween(1, 4)
    val teleEvoRows = teleEvo.count()
    val teleEvoSec = (System.nanoTime() - t2) / 1e9
    // reference: snapshot EXCEPT-ALL pair, v1 widened by hand to v4's schema
    val t3 = System.nanoTime()
    val v1Wide = t.read(1).withColumn("tag", lit(null).cast("string"))
    val snapEvo = t.read(4).exceptAll(v1Wide).withColumn("_change_type", lit("insert"))
      .unionByName(v1Wide.exceptAll(t.read(4)).withColumn("_change_type", lit("delete")))
    val snapEvoRows = snapEvo.count()
    val snapEvoSec = (System.nanoTime() - t3) / 1e9
    val divergeEvo = teleEvo.exceptAll(snapEvo).count() + snapEvo.exceptAll(teleEvo).count()
    val v4 = t.commitAt(4)
    val churnedEvo = v4.files.count(f => !v1Paths.contains(f.path)) +
      v1.files.count(f => !v4.files.map(_.path).toSet.contains(f.path))
    println(f"""{"probe":"cdf_evolution_crossing","sf_dir":"$sfDir",
      |"files_churned_in_window":$churnedEvo,
      |"telescoped_sec":$teleEvoSec%.2f,"telescoped_rows":$teleEvoRows,
      |"snapshot_diff_sec":$snapEvoSec%.2f,"snapshot_diff_rows":$snapEvoRows,
      |"rows_diverging":$divergeEvo}""".stripMargin.replaceAll("\n", ""))
    delete(new File(root))
    spark.stop()
  }

  private def delete(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(delete))
    f.delete(): Unit
  }
}
