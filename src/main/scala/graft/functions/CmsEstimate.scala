package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-query over a serialized count-min sketch: the READ side Spark
  * ships without. `count_min_sketch(...)` (built-in aggregate, partial
  * states merged distributively) produces the binary sketch; nothing in
  * the SQL surface can then ask it "how many of X?" — the class API
  * (`CountMinSketch.estimateCount`) is driver-side Scala only. This
  * expression closes that loop, the same gap-filling role
  * `VecDotExpr`/`VecSignBandsExpr` play for vectors.
  *
  * Frequency-sketch contract: estimate ≥ true count always (conservative
  * update), and ≤ true + ε·N with the sketch's confidence —
  * SketchFormatSpec asserts both sides against exact counts.
  *
  * Evaluation: `CodegenFallback` deliberately. The expression sits on the
  * few-rows-per-group READ side (one row per queried key), never in a
  * per-event hot path — deserialization cost is bounded by queried keys,
  * and a one-entry memo keyed on the sketch's byte-array identity makes
  * repeated probes of the same sketch free.
  */
case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate"

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override def nullSafeEval(sk: Any, v: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (cachedSketch == null || (cachedBytes ne bytes)) {
      cachedSketch = CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    cachedSketch.estimateCount(v.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateExpr =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  def cms_estimate(sketch: Column, value: Column): Column =
    GraftSqlBridge.column(CmsEstimateExpr(
      GraftSqlBridge.expression(sketch), GraftSqlBridge.expression(value)))

  /** SQL surface: `SELECT cms_estimate(sketch, 'key') FROM ...` — pairs
    * with Spark's built-in `count_min_sketch` aggregate, which produces
    * the binary sketch this expression probes. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_estimate", exprs => CmsEstimateExpr(exprs.head, exprs(1)), "scala_udf")
}
