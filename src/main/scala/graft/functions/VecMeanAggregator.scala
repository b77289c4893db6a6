package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Buffer for [[VecMeanAggregator]]: running element-wise sum + row count. */
case class VecMeanBuf(sums: Array[Double], n: Long)

/** Typed UDAF (SURVEY.md §2.10 X2 / §2.4 A11): element-wise mean of an
  * `array<float>` embedding column.
  *
  * Demonstrates the `Aggregator[IN, BUF, OUT]` extension point the reference
  * never needed (its aggregates are all built-in SQL). The merge is
  * associative+commutative, so Spark runs it as partial (map-side) + final
  * aggregation — the shuffle carries one (64-dim sums, count) buffer per
  * group per partition, not raw vectors; at 100 TB that's the same
  * communication pattern as a built-in `avg`.
  */
object VecMeanAggregator extends Aggregator[Seq[Float], VecMeanBuf, Seq[Double]] {

  override def zero: VecMeanBuf = VecMeanBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: VecMeanBuf, v: Seq[Float]): VecMeanBuf = {
    if (v == null) return b
    val sums = if (b.sums.isEmpty) new Array[Double](v.length) else b.sums
    var i = 0
    while (i < v.length && i < sums.length) { sums(i) += v(i).toDouble; i += 1 }
    VecMeanBuf(sums, b.n + 1)
  }

  override def merge(a: VecMeanBuf, b: VecMeanBuf): VecMeanBuf = {
    if (a.sums.isEmpty) return b
    if (b.sums.isEmpty) return a
    val sums = new Array[Double](a.sums.length)
    var i = 0
    while (i < sums.length) { sums(i) = a.sums(i) + b.sums(i); i += 1 }
    VecMeanBuf(sums, a.n + b.n)
  }

  override def finish(r: VecMeanBuf): Seq[Double] =
    if (r.n == 0) Seq.empty else r.sums.map(_ / r.n).toSeq

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  /** Column-world entry point: `df.groupBy(...).agg(vec_mean($"embedding"))`. */
  def vec_mean(c: Column): Column = udaf(this).apply(c)
}
