package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Engine-portable rounding for doubles that must hash-match the DuckDB
  * oracle (SURVEY.md §5 determinism contract).
  *
  * `round(x, d)` diverges between engines at half-boundaries: Spark rounds
  * the shortest-decimal representation HALF_UP (BigDecimal.valueOf), DuckDB
  * scales the raw binary double — e.g. round(19570.815, 2) → 19570.82 in
  * Spark but 19570.81 in DuckDB (because 19570.815·100 = 1957081.49999…).
  *
  * `floor(x·10^d + 0.5) / 10^d` instead uses only IEEE-exact operations that
  * both engines compute bit-identically, so the result is deterministic
  * across engines (round-half-toward-+∞ on the scaled binary value). Codegen
  * friendly: compiles to three arithmetic ops inside whole-stage codegen.
  *
  * The DuckDB-side twin is written literally in oracle SQL:
  * `floor(x * 100 + 0.5) / 100`.
  */
object PortableRound {
  def pround(c: Column, digits: Int): Column = {
    val f = math.pow(10, digits)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }
}
