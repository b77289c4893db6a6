package graft.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Metadata-only aggregates (round-15 verdict task 2, Delta/Iceberg's
  * `OptimizeMetadataOnlyQuery` analog): a global `COUNT(*)` over a graft
  * table answers from the MANIFEST — every entry records its file's exact
  * footer row count and its deletion vector's cardinality, so
  * `Σ liveRows` is the exact scan result at zero data IO. At 100 TB this
  * is the difference between a constant-time answer off one manifest
  * JSON and a full table scan for the most-typed query in existence.
  *
  * Fires only on the provably-exact shape: a GLOBAL aggregate (no
  * grouping) whose every output is a plain `count(*)`/`count(1)` —
  * never `count(col)` (null-sensitive), never DISTINCT, never FILTER —
  * sitting directly on the graft relation through row-preserving
  * Projects only (no Filter in between: a filtered count must scan).
  * Deletion-vectored snapshots stay eligible — that is what the
  * manifest-carried `dvRows` is for. The rewrite is value-equivalent to
  * execution, so it is safe anywhere the shape appears, subqueries
  * included. Matches BOTH renderings of a graft read: the DSv2 relation
  * and the converted native file-source relation
  * ([[GraftNativeScanRule]] — rule order between the two is free).
  */
object GraftMetadataCountRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    org.apache.spark.sql.SparkSession.active.sessionState.conf
      .getConfString("spark.graft.metadataCount", "true").toBoolean

  /** Exact live row count when `plan` IS a graft snapshot read (through
    * row-preserving Projects), else None. */
  private def snapshotRows(plan: LogicalPlan): Option[Long] = plan match {
    case Project(_, child) => snapshotRows(child) // projects keep cardinality
    case r: DataSourceV2Relation => r.table match {
      case t: GraftSparkTable if !r.options.containsKey("readChangeFeed") &&
          !r.options.containsKey("changesFrom") &&
          !r.options.containsKey("changesFromTimestamp") =>
        t.resolved.map { case (gt, v) =>
          gt.commitAt(v).files.map(_.liveRows).sum
        }
      case _ => None
    }
    case LogicalRelation(HadoopFsRelation(idx: GraftFileIndex, _, _, _, _, _), _, _, _, _) =>
      Some(idx.snapshotLiveRows)
    case _ => None
  }

  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _), _)
        if v != null => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(Nil, exprs, child, _)
          if exprs.nonEmpty && exprs.forall(isCountStar) =>
        snapshotRows(child) match {
          case Some(n) =>
            LocalRelation(agg.output.map(_.toAttribute),
              Seq(InternalRow.fromSeq(Seq.fill(exprs.size)(n))))
          case None => agg
        }
    }
  }
}
