package graft.tools

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Quiet, Tables}
import graft.table.GraftTable

/** STRING-KEYED copy-on-write write-amplification probe (round-12 verdict
  * task 1's "Done" evidence): the `documents`-corpus shape — a table
  * merged by a STRING doc id — previously rewrote O(table) per merge
  * because manifests carried no string stats. With truncated string
  * min/max recorded (32-cp prefix min, incremented-prefix max) and
  * `cowSplit` pruning in UTF-8 order, a narrow doc-id batch must rewrite
  * only its own files.
  *
  * Setup mirrors ProfMerge: a doc-id-keyed table range-clustered into 64
  * files (the layout a maintained merge table converges to). To probe at
  * a realistic file count the corpus is replicated ~200× with distinct
  * zero-padded string ids. Probe: replace-by-key merge
  * ([[GraftTable.mergeUpsert]] — the MERGE INTO path) of a batch touching
  * the lowest ~2% of the id space; report files/bytes carried vs
  * rewritten from the MANIFESTS, with the pre-round-13 full rewrite as
  * the control, plus a 5-generation half-overlapping sweep proving the
  * amplification stays flat (merge output re-clusters on the string key).
  *
  * Usage: runMain graft.tools.ProfMergeStr [sfDir]  (default /root/testdata/sf0.1)
  */
object ProfMergeStr {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Quiet.storageShutdownRace()
    import spark.implicits._

    // documents replicated with distinct string ids: id space is dense
    // zero-padded decimal, so range-clustering on the STRING orders like
    // the numeric id and per-file string min/max are tight
    val reps = 200
    val docs = Tables.table(spark, sfDir, "documents")
      .crossJoin(spark.range(reps).toDF("rep"))
      .select(format_string("doc-%010d", $"doc_id" * reps + $"rep").as("sid"),
        $"text", $"lang", $"source", $"n_chars")
    val base = docs.repartitionByRange(64, $"sid")
    val root = s"${sys.props("java.io.tmpdir")}/graft_profmergestr_${ProcessHandle.current.pid}"
    delete(new File(root))
    val t = GraftTable.create(spark, root, base)
    val v1 = t.commitAt(1)
    val tableBytes = v1.files.map(f => new File(s"$root/${f.path}").length()).sum
    val nIds = docs.count()

    // the day's batch: updated char counts for the lowest ~2% of ids
    val cut = f"doc-${nIds / 50}%010d"
    val batch = docs.filter($"sid" < cut)
      .withColumn("n_chars", $"n_chars" + 1000000L)
    val batchRows = batch.count()

    val t0 = System.nanoTime()
    t.mergeUpsert(batch, Seq("sid"))
    val cowSec = (System.nanoTime() - t0) / 1e9
    val v2 = t.commitAt(2)
    val v1Paths = v1.files.map(_.path).toSet
    val carried = v2.files.filter(f => v1Paths.contains(f.path))
    val written = v2.files.filterNot(f => v1Paths.contains(f.path))
    val writtenBytes = written.map(f => new File(s"$root/${f.path}").length()).sum

    // control: the pre-round-13 behavior — full anti-join rewrite
    val t1 = System.nanoTime()
    val fullRoot = s"${root}_full"
    delete(new File(fullRoot))
    val tf = GraftTable.create(spark, fullRoot,
      t.read(1).join(batch.select($"sid"), Seq("sid"), "left_anti")
        .unionByName(batch))
    val fullSec = (System.nanoTime() - t1) / 1e9
    val fullBytes = tf.commitAt(1).files
      .map(f => new File(s"$fullRoot/${f.path}").length()).sum

    // COW result must equal the control snapshot (cell-exact)
    val diff = t.read(2).exceptAll(tf.read(1)).count() +
      tf.read(1).exceptAll(t.read(2)).count()

    // generation sweep: 2%-wide id slices stepping 1% (half-overlapping)
    val genStats = (1 to 5).map { g =>
      val lo = f"doc-${g * nIds / 100}%010d"
      val hi = f"doc-${(g + 2) * nIds / 100}%010d"
      val gBatch = docs.filter($"sid" >= lo && $"sid" < hi)
        .withColumn("n_chars", $"n_chars" + g)
      val parentC = t.commitAt(t.latestVersion)
      t.mergeUpsert(gBatch, Seq("sid"))
      val cNew = t.commitAt(t.latestVersion)
      val prevPaths = parentC.files.map(_.path).toSet
      val w = cNew.files.filterNot(f => prevPaths.contains(f.path))
      val bytes = w.map(f => new File(s"$root/${f.path}").length()).sum
      (w.size, bytes, parentC.files.size)
    }
    val genStr = genStats.zipWithIndex.map { case ((nf, b, tot), i) =>
      f"""{"gen":${i + 2},"files_rewritten":$nf,"of":$tot,"bytes":$b}"""
    }.mkString("[", ",", "]")

    println(f"""{"probe":"merge_cow_string","sf_dir":"$sfDir","ids":$nIds,
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
