package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` embedding columns, built
  * from codegen'd higher-order functions (SURVEY.md §2.11 L3).
  *
  * Design: `zip_with` + `aggregate` compile into whole-stage codegen loops —
  * no UDF serialization boundary, no shuffle. The fold is strictly
  * left-to-right, which makes the double-precision result deterministic and
  * bit-identical to any other engine that sums sequentially (the DuckDB
  * oracle's `list_dot_product` does) — required for hash-matched correctness.
  *
  * At 100 TB: these are per-row O(dim) expressions inside a scan stage; the
  * scale problem is pair ENUMERATION, not the dot product — see
  * [[graft.llm.Similarity]] for the LSH-bucketed path that prunes pairs.
  */
object VectorFunctions {

  /** Element-promoting dot product: Σ aᵢ·bᵢ in double, left-to-right. */
  def vec_dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (s, x) => s + x)

  /** L2 norm. */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** Cosine similarity in [-1, 1]. */
  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
}
