package graft

import graft.functions.VecDotExpr
import graft.plans.{AsOfJoinStrategy, VecDotRewrite}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions for the graft engine: activate with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)` at session build time).
  *
  * Injects:
  *  - [[graft.plans.VecDotRewrite]]: transparently accelerates
  *    higher-order dot-product expressions to the native codegen'd form;
  *  - [[graft.plans.AsOfJoinStrategy]]: plans the whole-operator
  *    [[graft.plans.AsOfJoin]] node as the native sort-merge exec;
  *  - [[graft.table.GraftMergeRule]]: lowers SQL `MERGE INTO` on graft
  *    tables to the table format's transactional copy-on-write merge
  *    (analyzer rules cannot be added post-hoc, so MERGE requires the
  *    extension at session build time — the other injections also have
  *    lazy per-query registration paths);
  *  - SQL function `vec_dot_native(array<float>, array<float>) -> double`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => VecDotRewrite)
    // Rebuild eligible graft DSv2 reads as native file-source relations
    // (GraftFileIndex) so dynamic partition pruning, runtime bloom
    // filters and parquet pushdown all reach graft tables; runs in the
    // operator-optimization batch — before PartitionPruning and
    // InjectRuntimeFilter, which then see a plain HadoopFsRelation.
    e.injectOptimizerRule(session => new graft.table.GraftNativeScanRule(session))
    // Global COUNT(*) over a graft table answers exactly from the
    // manifest's (liveRows) sums — zero data IO (Delta/Iceberg's
    // metadata-only aggregate).
    e.injectOptimizerRule(_ => graft.table.GraftMetadataCountRule)
    // Re-expose a V1-fallback scan's SupportsReportStatistics through the
    // post-pushdown wrapper (graft.plans.ScanStatsRule) so graft dims
    // auto-broadcast. The swap must run AFTER V2ScanRelationPushDown, and
    // the only extension batch past that point is "User Provided
    // Optimizers" (experimental.extraOptimizations) — registered here via
    // the rule builder, which the optimizer invokes lazily on first use,
    // when the session is fully constructed. The preCBO injection itself
    // is a harmless no-op (it runs before the ScanRelation exists); it is
    // kept because the builder hook is what carries the registration.
    e.injectPreCBORule { session =>
      val cur = session.experimental.extraOptimizations
      if (!cur.contains(graft.plans.ScanStatsRule))
        session.experimental.extraOptimizations = cur :+ graft.plans.ScanStatsRule
      graft.plans.ScanStatsRule
    }
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // SQL MERGE INTO on graft tables → the transactional COW merge path
    e.injectResolutionRule(session => new graft.table.GraftMergeRule(session))
    e.injectFunction((
      new FunctionIdentifier("vec_dot_native"),
      new ExpressionInfo(classOf[VecDotExpr].getName, "vec_dot_native"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDotExpr(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[graft.functions.CmsEstimateExpr].getName, "cms_estimate"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CmsEstimateExpr(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("vec_sign_bands"),
      new ExpressionInfo(classOf[graft.functions.VecSignBandsExpr].getName, "vec_sign_bands"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        def intLit(x: org.apache.spark.sql.catalyst.expressions.Expression, what: String): Int =
          x match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"vec_sign_bands: $what must be an integer literal, got $other")
          }
        graft.functions.VecSignBandsExpr(exprs.head, exprs(1),
          intLit(exprs(2), "bands"), intLit(exprs(3), "rowsPerBand"))
      }))
  }
}
