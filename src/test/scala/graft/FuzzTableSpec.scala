package graft

import java.nio.file.Files

import graft.tools.FuzzTable

/** In-suite contract for the transactional DML-program fuzzer: two
  * seeded programs execute end-to-end with every per-commit shadow
  * check, the retained-history time-travel sweep, the cold re-open
  * replay, and the CDF multiset identity (the recorded campaigns run
  * longer programs via `runMain graft.tools.FuzzTable` — SCALE.md). */
class FuzzTableSpec extends SparkSpec {

  private def tmpRoot(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_fts_$tag").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("seeded DML programs hold every shadow, time-travel, and CDF invariant") {
    Seq(7L, 13L).foreach { seed =>
      val o = FuzzTable.runProgram(spark, seed, nOps = 25, tmpRoot(s"s$seed"))
      assert(o.commits > 10, s"seed $seed: expected a real program, got ${o.commits} commits")
      assert(o.checks > 30, s"seed $seed: expected the full check battery, got ${o.checks}")
    }
  }
}
