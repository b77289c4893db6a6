package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations (SURVEY.md §7 risk register:
  * the reference's real data is heavily skewed — dashboard 2 shows the top
  * title at 22,724 edits vs an "Other" bucket of 941,690).
  *
  * First line of defense is AQE's runtime skew-join splitting (on by
  * default, handles sort-merge joins). Salting is the explicit fallback
  * for the cases AQE can't fix: extreme single-key skew, shuffled-hash
  * joins, and skewed aggregations where one reducer would otherwise own a
  * hot key.
  */
object SkewJoin {

  /** Inner equi-join with a salted left (fact) side: each left row gets a
    * deterministic salt in [0, saltFactor) derived from its content, and
    * the right (dimension-ish) side is replicated saltFactor times, so a
    * hot key spreads over saltFactor reducers instead of one.
    *
    * Semantically identical to `left.join(right, leftKey === rightKey)`;
    * costs saltFactor× the right side's shuffle volume — use for
    * fact-to-medium joins where the hot key dominates a reducer.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col): _*)), lit(saltFactor)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft
      .join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }

  /** Skew-safe grouped count: two-phase aggregation — first count per
    * (key, salt) so the hot key is pre-combined across saltFactor
    * reducers, then sum per key. Same result as `groupBy(key).count()`.
    * (Partial aggregation already does this within map partitions; the
    * salt phase additionally spreads the REDUCE side of a hot key.)
    */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    df.withColumn("__salt",
        pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)), lit(saltFactor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("count"))
  }
}
