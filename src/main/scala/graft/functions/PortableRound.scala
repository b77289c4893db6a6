package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{abs, floor, lit, when}

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
  /** Non-finite inputs pass through unrounded: Spark's `floor(double)`
    * returns BIGINT, which would collapse NaN to 0 and ±Inf to
    * Long.Max/Min — silently masking dirty numerics that DuckDB's
    * double-typed floor propagates (found by the round-8 NaN/Inf corpus
    * audit: a NaN bucket average surfaced as 0.0 on the Spark side only).
    * The guard is `abs(c) < ∞`, which is false for NaN and ±Inf; NULL
    * stays NULL through both branches. Finite values are bit-identical
    * to the unguarded form, so fixture hashes are unchanged. */
  def pround(c: Column, digits: Int): Column = {
    val f = math.pow(10, digits)
    when(abs(c) < lit(Double.PositiveInfinity),
      floor(c * lit(f) + lit(0.5)) / lit(f)).otherwise(c)
  }
}
