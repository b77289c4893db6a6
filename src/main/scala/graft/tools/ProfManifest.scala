package graft.tools

import java.io.File

import org.apache.spark.sql.SparkSession

import graft.table.{ColStat, GraftTable, ManifestFile}

/** Measured probe for DRIVER-SIDE manifest scale: a 100-TB table at
  * ~128 MB/file is ~800k manifest entries, and every planning step —
  * snapshot resolution, stats pruning, the metadata-only count — runs
  * over that list on the driver. This probe commits N SYNTHETIC entries
  * (planning never opens data files, so the paths don't need to exist)
  * and measures the planning path end to end:
  *
  *  - `commit`: serialize + atomically publish the delta manifest;
  *  - cold `commitAt`: JSON parse + snapshot build on a fresh handle
  *    (the once-per-process cost an executor-side planner pays);
  *  - warm `commitAt`: the version-keyed cache hit every later query
  *    pays (immutable snapshots make the cache trivially correct);
  *  - `checkpoint` write + cold resolve THROUGH the checkpoint;
  *  - `pruneFiles` with a partition value + a stats range (the per-query
  *    fold a 1000-executor cluster amortizes exactly once, on the
  *    driver);
  *  - the metadata-only `COUNT(*)` — rule fold over all N entries.
  *
  * Run: `runMain graft.tools.ProfManifest [nFiles]`.
  */
object ProfManifest {

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(300000)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Quiet.storageShutdownRace()
    import spark.implicits._

    val root = s"${sys.props("java.io.tmpdir")}/graft_profmft_${ProcessHandle.current.pid}"
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new File(root))

    def timed[A](body: => A): (A, Long) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1000000)
    }

    val t = GraftTable.create(spark, root,
      Seq((1L, 1)).toDF("id", "dd"))
    val rowsPerFile = 1000000L
    val synth: Seq[ManifestFile] = (0 until nFiles).map { i =>
      val lo = i.toLong * rowsPerFile
      ManifestFile(
        path = f"data/synth/dd=${i % 30 + 1}/part-$i%07d.parquet",
        rows = rowsPerFile,
        stats = Map("id" -> ColStat("long", lo.toString,
          (lo + rowsPerFile - 1).toString, 0L)),
        partition = Map("dd" -> (i % 30 + 1).toString),
        bytes = 128L * 1024 * 1024)
    }
    val schema = t.commitAt(1).schema
    val (v2, commitMs) = timed {
      t.commit(1, "synth_append", t.commitAt(1).files ++ synth, schema,
        partitionCols = Some(Seq("dd")))
    }

    val (_, coldMs) = timed {
      GraftTable.forPath(spark, root).commitAt(v2).files.size
    }
    val warmHandle = GraftTable.forPath(spark, root)
    warmHandle.commitAt(v2)
    val (_, warmMs) = timed { warmHandle.commitAt(v2).files.size }

    val (_, ckptMs) = timed { warmHandle.checkpoint() }
    val (_, ckptColdMs) = timed {
      GraftTable.forPath(spark, root).commitAt(v2).files.size
    }

    // one partition value + a stats range: the flagship day-slice shape
    val (kept, pruneMs) = timed {
      warmHandle.pruneFiles(v2,
        ranges = Seq(("id", BigDecimal(0), BigDecimal(5L * rowsPerFile))),
        strRanges = Seq(("dd", Some("3"), Some("3")))).size
    }

    // metadata-only COUNT(*): the optimizer fold walks all N entries
    val (cnt, countMs) = timed {
      spark.read.format("graft").load(root).count()
    }
    require(cnt == 1L + nFiles.toLong * rowsPerFile, s"bad fold: $cnt")

    val mftBytes = new File(new File(root, "_graft_log"),
      f"v$v2%020d.json").length()
    println(s"""{"probe":"manifest_scale","files":$nFiles,""" +
      s""""manifest_mb":${"%.1f".format(mftBytes / 1e6)},""" +
      s""""commit_ms":$commitMs,"cold_resolve_ms":$coldMs,""" +
      s""""warm_resolve_ms":$warmMs,"checkpoint_ms":$ckptMs,""" +
      s""""ckpt_cold_resolve_ms":$ckptColdMs,""" +
      s""""prune_ms":$pruneMs,"pruned_to":$kept,""" +
      s""""metadata_count_ms":$countMs}""")
    spark.stop()
  }
}
