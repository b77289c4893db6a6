package graft.tools

import graft.Tables
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scale probe for `dedup_simhash_hamming`'s fingerprint-width law.
  *
  * The declared query (Dedup.scala) uses a 32-bit simhash split into 4
  * disjoint 8-bit blocks (pigeonhole: Hamming ≤ 3 ⇒ exact agreement on
  * ≥ 1 block). RANDOM block collisions are n²·(d+1)/2^(bits+1): right at
  * the gate scales (n=50k at the 10× replica set → ~2×10⁷ candidates,
  * measured cell-exact there) and hopeless at the 100× uniqtext corpus
  * (n=500k → 500000²·4/2⁹ ≈ 2×10⁹ random candidates — measured as the
  * executor-killing spill this probe replaces). Unlike sign-LSH,
  * block WIDTH cannot grow at fixed fingerprint width without weakening
  * the Hamming guarantee (d+1 blocks are forced), so the scale knob is
  * the FINGERPRINT: this probe computes a 120-bit simhash (two 60-bit
  * md5-derived token hashes — the same hash family the declared query
  * uses) split into 4 disjoint 30-bit blocks. Same pigeonhole guarantee
  * (Hamming ≤ 3 over the 120 bits), random-collision term drops to
  * n²·4/2^31 ≈ 5×10² at n=500k — candidate mass is then bounded by TRUE
  * near-duplicates (the corpus's real mutation density), not by the
  * geometry. Candidate-then-verify shape identical to
  * the declared query; the verify is bit_count(xor) over both words.
  *
  * Usage: runMain graft.tools.ProfSimhashScale <sfDir> [maxHamming]
  */
object ProfSimhashScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val maxHam = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def sec(t0: Long) = (System.nanoTime() - t0) / 1e9

    // two independent 60-bit token hashes from disjoint md5 halves —
    // the declared query's hash family, widened
    val tokens = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(split(trim($"text"), " ")).as("w"))
      .withColumn("h1", conv(substring(md5($"w"), 1, 15), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(md5($"w"), 17, 15), 16, 10).cast("long"))
    def bitSums(h: Column, tag: String): Seq[Column] = (0 until 60).map(i =>
      sum(when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"$tag$i"))
    def assemble(tag: String): Column = (0 until 60)
      .map(i => when(col(s"$tag$i") >= 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

    var t0 = System.nanoTime()
    val sigs = tokens.groupBy($"doc_id")
      .agg((bitSums($"h1", "a") ++ bitSums($"h2", "b")).head,
           (bitSums($"h1", "a") ++ bitSums($"h2", "b")).tail: _*)
      .select($"doc_id", assemble("a").as("s1"), assemble("b").as("s2"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = sigs.count()
    val sigSec = sec(t0)

    // 4 disjoint 30-bit blocks: s1[0:30), s1[30:60), s2[0:30), s2[30:60)
    t0 = System.nanoTime()
    val blocked = sigs.select($"doc_id", $"s1", $"s2",
      posexplode(array(
        $"s1".bitwiseAND((1L << 30) - 1),
        shiftright($"s1", 30).bitwiseAND((1L << 30) - 1),
        $"s2".bitwiseAND((1L << 30) - 1),
        shiftright($"s2", 30).bitwiseAND((1L << 30) - 1))).as(Seq("blk", "bv")))
    val cand = blocked
      .select($"blk", $"bv", $"doc_id".as("a_id"), $"s1".as("sa1"), $"s2".as("sa2"))
      .join(blocked.select($"blk", $"bv", $"doc_id".as("b_id"),
        $"s1".as("sb1"), $"s2".as("sb2")), Seq("blk", "bv"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id", $"sa1", $"sa2", $"sb1", $"sb2").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nCand = cand.count()
    val candSec = sec(t0)

    t0 = System.nanoTime()
    val ham = bit_count($"sa1".bitwiseXOR($"sb1")) +
      bit_count($"sa2".bitwiseXOR($"sb2"))
    val nPairs = cand.filter(ham <= maxHam).count()
    val verifySec = sec(t0)

    println(s"""{"probe":"simhash_scale","n":$n,"bits":120,"blocks":4,""" +
      s""""max_hamming":$maxHam,"candidates":$nCand,"pairs":$nPairs,""" +
      f""""sig_sec":$sigSec%.1f,"cand_sec":$candSec%.1f,"verify_sec":$verifySec%.1f}""")
    spark.stop()
  }
}
