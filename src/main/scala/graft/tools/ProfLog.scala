package graft.tools

import java.io.File

import org.apache.spark.sql.SparkSession

import graft.Quiet
import graft.table.GraftTable

/** Delta-encoded commit-log probe (round-13): pre-delta-log, EVERY
  * commit serialized the table's complete file list — O(files) JSON
  * bytes per mutation, the cost that makes a high-frequency streaming
  * sink unviable on a table whose file count grows without bound (at 1M
  * files ≈ hundreds of MB of manifest per single-file append). Now a
  * commit logs only its add/remove churn, every
  * [[GraftTable.CheckpointInterval]]-th commit publishes a sidecar
  * checkpoint, and snapshot resolution replays a BOUNDED chain.
  *
  * Builds a wide base (many files), piles small appends on top, and
  * reports:
  *  - bytes per delta manifest vs bytes per checkpoint (the old design's
  *    per-commit cost ≈ the checkpoint size — every commit paid it);
  *  - cold-cache snapshot resolution time at the worst chain depth
  *    (checkpoint + K−1 deltas) vs at a checkpointed version.
  *
  * Usage: runMain graft.tools.ProfLog [baseFiles] [nAppends]
  */
object ProfLog {

  def main(args: Array[String]): Unit = {
    val baseFiles = args.headOption.map(_.toInt).getOrElse(512)
    val nAppends = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Quiet.storageShutdownRace()
    import spark.implicits._

    val root = s"${sys.props("java.io.tmpdir")}/graft_proflog_${ProcessHandle.current.pid}"
    delete(new File(root))
    // a wide base: baseFiles range-clustered files (stats per file, the
    // realistic manifest-entry weight)
    val base = spark.range(0, baseFiles * 1000L).toDF("id")
      .withColumn("v", $"id" % 97)
      .repartitionByRange(baseFiles, $"id")
    val t = GraftTable.create(spark, root, base)
    val wTimes = new Array[Double](nAppends)
    (1 to nAppends).foreach { i =>
      val w0 = System.nanoTime()
      t.append(spark.range(i * 10L, i * 10L + 10).toDF("id")
        .withColumn("v", $"id" % 97))
      wTimes(i - 1) = (System.nanoTime() - w0) / 1e9
    }

    val logDir = new File(root, "_graft_log")
    def size(name: String): Long = new File(logDir, name).length()
    val versions = t.versions
    val deltaVs = versions.filter(_ >= 2)
    val deltaBytes = deltaVs.map(v => size(f"v$v%020d.json"))
    val ckpts = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".ckpt.json"))
    require(ckpts.nonEmpty, "expected at least one cadence checkpoint")
    val ckptBytes = ckpts.map(_.length()).max
    val fullV1Bytes = size(f"v${1L}%020d.json")

    // cold-cache resolution at the worst depth: the version just BEFORE
    // the next checkpoint (K−1 deltas to replay) vs at a checkpoint
    val k = GraftTable.CheckpointInterval
    val worst = versions.filter(v => v % k == k - 1).max
    val atCkpt = versions.filter(v => v % k == 0 && v > 1).max
    def coldResolve(v: Long): Double = {
      val fresh = GraftTable.forPath(spark, root) // empty cache
      val r0 = System.nanoTime()
      val c = fresh.commitAt(v)
      require(c.files.size >= baseFiles)
      (System.nanoTime() - r0) / 1e9
    }
    val worstSec = (1 to 5).map(_ => coldResolve(worst)).min
    val ckptSec = (1 to 5).map(_ => coldResolve(atCkpt)).min

    // "what is latest?" — the hint-accelerated probe vs the full listing
    // (the per-commit / per-micro-batch hot call; on an object store the
    // listing is paginated LIST requests, here both are local syscalls so
    // the ratio understates the real win)
    val calls = 1000
    val h0 = System.nanoTime()
    (1 to calls).foreach(_ => require(t.latestVersion == versions.max))
    val hintSec = (System.nanoTime() - h0) / 1e9
    val l0 = System.nanoTime()
    (1 to calls).foreach(_ => require(t.versions.lastOption.contains(versions.max)))
    val listSec = (System.nanoTime() - l0) / 1e9

    // correctness spot-check: the reconstructed latest snapshot is exact
    val expect = baseFiles * 1000L + (1 to nAppends).map(_ => 10L).sum -
      // appended ids overlap the base range: count distinct rows instead
      0L
    require(t.read().count() == expect, s"row count ${t.read().count()} != $expect")

    println(f"""{"probe":"delta_log","base_files":$baseFiles,"appends":$nAppends,
      |"delta_manifest_bytes_mean":${deltaBytes.sum / deltaBytes.size},
      |"delta_manifest_bytes_max":${deltaBytes.max},
      |"checkpoint_bytes":$ckptBytes,"v1_full_bytes":$fullV1Bytes,
      |"old_design_bytes_per_commit":$ckptBytes,
      |"log_write_reduction":${ckptBytes.toDouble / (deltaBytes.sum / deltaBytes.size)}%.0f,
      |"append_sec_mean":${wTimes.sum / wTimes.length}%.3f,
      |"cold_resolve_worst_chain_sec":$worstSec%.4f,
      |"cold_resolve_at_ckpt_sec":$ckptSec%.4f,
      |"latest_hint_sec_per_1k":$hintSec%.4f,
      |"latest_list_sec_per_1k":$listSec%.4f}""".stripMargin.replaceAll("\n", ""))
    delete(new File(root))
    spark.stop()
  }

  private def delete(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(delete))
    f.delete(): Unit
  }
}
