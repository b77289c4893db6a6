package graft.tools

import graft.Tables
import graft.functions.VecDotNative.{vec_norm_native, vec_sign_bands}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scale probe for `sim_threshold_lsh`'s documented geometry law.
  *
  * The expected RANDOM-collision candidate count of sign-band LSH is
  * n²·b·2^-(r+1) (Similarity.scala scaladoc), so rows-per-band r must
  * track log₂(n) as the corpus grows. The declared query's geometry is
  * fixture-tuned (b=8, r=8 — right for n=2k at sf0.1, where the random
  * term is 2000²·8/2⁹ ≈ 6×10⁴ pairs); at the 100× uniqtext corpus
  * (n=200k) the same geometry implies 200000²·8/2⁹ ≈ 6.3×10⁸ candidate
  * pairs — measured as the executor-killing sort spill this probe
  * replaces, i.e. the law, observed. This probe runs the IDENTICAL
  * pipeline shape
  * (signatures → (band, bucket) equi-join on ids only → exact cosine
  * verify on the candidate set) with the geometry an operator at that
  * corpus size would pick, and reports candidate mass, verified-pair
  * count and per-stage wall time. r ≈ log₂(n) restores the near-linear
  * candidate budget; recall at a FIXED similarity then drops as p^r per
  * band, which is why b must grow alongside (linear cost) — both knobs
  * are printed so the trade is visible in the output, not prose.
  *
  * Usage: runMain graft.tools.ProfLshScale <sfDir> <bands> <rowsPerBand> [tau]
  */
object ProfLshScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val bands = args(1).toInt
    val rows = args(2).toInt
    val tau = if (args.length > 3) args(3).toDouble else 0.35
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rnd = new scala.util.Random(7)
    val planes = Seq.fill(bands * rows)(Seq.fill(64)(rnd.nextGaussian().toFloat))

    val e = Tables.embeddings(spark, sfDir)
      .withColumn("nrm", vec_norm_native($"embedding"))
    val n = e.count()

    def sec(t0: Long) = (System.nanoTime() - t0) / 1e9

    // signatures once, persisted before the self-join (the declared
    // query's Materialize.pin shape — ids + band buckets only)
    var t0 = System.nanoTime()
    val banded = e
      .select($"vec_id",
        vec_sign_bands($"embedding", typedLit(planes.flatten), bands, rows).as("sb"))
      .select($"vec_id", posexplode($"sb").as(Seq("band", "bv")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    banded.count()
    val sigSec = sec(t0)

    t0 = System.nanoTime()
    val cand = banded.select($"band", $"bv", $"vec_id".as("a_id"))
      .join(banded.select($"band", $"bv", $"vec_id".as("b_id")), Seq("band", "bv"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nCand = cand.count()
    val candSec = sec(t0)

    t0 = System.nanoTime()
    val nPairs = cand
      .join(e.select($"vec_id".as("a_id"), $"embedding".as("va"), $"nrm".as("na")), Seq("a_id"))
      .join(e.select($"vec_id".as("b_id"), $"embedding".as("vb"), $"nrm".as("nb")), Seq("b_id"))
      .filter(graft.functions.VecDotNative
        .vec_cosine_prenorm($"va", $"vb", $"na", $"nb") >= tau)
      .count()
    val verifySec = sec(t0)

    println(s"""{"probe":"lsh_scale","n":$n,"bands":$bands,"rows":$rows,""" +
      s""""tau":$tau,"candidates":$nCand,"pairs":$nPairs,""" +
      f""""sig_sec":$sigSec%.1f,"cand_sec":$candSec%.1f,"verify_sec":$verifySec%.1f}""")
    spark.stop()
  }
}
