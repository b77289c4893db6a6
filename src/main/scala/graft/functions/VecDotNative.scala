package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product (SURVEY.md
  * §2.10 X4 / §4: "custom `Expression` for cosine IF the higher-order
  * formulation benchmarks poorly — start built-in, measure, escalate").
  *
  * The higher-order formulation (`aggregate(zip_with(a,b,*),0d,+)`)
  * materializes the element-wise product ARRAY per row before folding —
  * an O(dim) allocation per pair in pairwise joins. This expression
  * generates a single fused primitive loop (`doGenCode`), no intermediate
  * array, no boxing:
  *
  * {{{ for (i < n) s += (double) a.getFloat(i) * (double) b.getFloat(i); }}}
  *
  * Numerics: identical left-to-right double summation as the higher-order
  * fold and as DuckDB's `list_dot_product` — bit-exact interchangeable, so
  * swapping it under `sim_*` queries cannot change oracle-checked results.
  *
  * Assumes non-null float array elements (embedding columns); null arrays
  * propagate null via `BinaryExpression`'s null handling.
  */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot_native expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot_native"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)
}

/** Column-world + SQL-world entry points for the native vector ops. */
object VecDotNative {

  def vec_dot_native(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      VecDotExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def vec_norm_native(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot_native(a, a))

  def vec_cosine_native(a: Column, b: Column): Column =
    vec_dot_native(a, b) / (vec_norm_native(a) * vec_norm_native(b))

  /** Register `vec_dot_native` for SQL callers (library surface):
    * `SELECT vec_dot_native(embedding, embedding) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot_native", exprs => VecDotExpr(exprs.head, exprs(1)), "scala_udf")
}
