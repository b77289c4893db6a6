package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Optimizer rule (injected by [[graft.GraftExtensions]], running in the
  * operator-optimization batch — BEFORE V2 scan pushdown, partition
  * pruning and runtime-filter injection): rewrite every eligible graft
  * DSv2 read relation into a native file-source relation over a
  * [[GraftFileIndex]].
  *
  * WHY (round-14 verdict task 1): the DSv2 scan executes through the V1
  * fallback, and neither dynamic partition pruning nor
  * `InjectRuntimeFilter` can reach inside a `RowDataSourceScanExec` — a
  * dim-driven date slice of a partitioned graft fact scanned every
  * surviving file. As a `LogicalRelation(HadoopFsRelation)` the scan
  * plans as `FileSourceScanExec`, and Spark's own `PartitionPruning` /
  * `InjectRuntimeFilter` rules apply to it exactly as to a plain parquet
  * table — DPP subqueries filter the partition directories the index
  * reports, runtime blooms land as data filters, parquet pushdown and
  * the vectorized reader are native. This is Delta's architecture (its
  * scan IS a HadoopFsRelation over TahoeLogFileIndex); the DSv2 V1 path
  * remains for the snapshots the native parquet reader cannot serve
  * raw:
  *
  *  - files carrying DELETION VECTORS (rows must be masked at read);
  *  - non-identity COLUMN MAPPING (files store physical names);
  *  - CDF / streaming reads (different relation classes — never match);
  *  - partition-EVOLVED snapshots with mixed layout eras (one
  *    partitionSchema cannot describe both), and partition values that
  *    do not cast cleanly to their column types.
  *
  * The rewrite preserves the relation's output attribute ids through an
  * alias Project, so every reference above it — joins, aggregates,
  * subqueries — resolves unchanged. Plans containing ANY command node
  * (DELETE/UPDATE/MERGE lower through the DSv2 relation; writes carry
  * their target out-of-child) are left untouched: correctness first, and
  * a DML plan's read side is never the scan bottleneck.
  */
final class GraftNativeScanRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SparkSession.active.sessionState.conf
      .getConfString("spark.graft.nativeFileScan", "true").toBoolean

  private def eligible(tbl: GraftSparkTable,
                       opts: org.apache.spark.sql.util.CaseInsensitiveStringMap): Boolean =
    tbl.resolved.exists { case (t, v) =>
      // the per-snapshot part is O(files) and the rule runs on every
      // fixed-point pass — cache by (root, version): a committed version
      // is immutable, so the answer never changes
      !opts.containsKey("readChangeFeed") &&
        GraftNativeScanRule.eligibilityCache.computeIfAbsent((t.root, v), { _ =>
          val c = t.commitAt(v)
          c.columnMapping.forall { case (k, p) => k == p } &&
            c.files.forall(_.dv.isEmpty) &&
            new GraftFileIndex(SparkSession.active, t, v).nativeReadable
        })
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    if (plan.exists(_.isInstanceOf[Command])) return plan
    plan.transformUp {
      case r: DataSourceV2Relation => r.table match {
        case tbl: GraftSparkTable if eligible(tbl, r.options) =>
          val (t, v) = tbl.resolved.get
          val session = SparkSession.active
          val index = new GraftFileIndex(session, t, v)
          val fsRelation = HadoopFsRelation(index, index.partitionSchema,
            index.dataSchema, None, new ParquetFileFormat, Map.empty)(session)
          val lr = LogicalRelation(fsRelation)
          val byName = lr.output.map(a => a.name -> a).toMap
          // keep the DSv2 relation's exprIds alive for everything above
          Project(r.output.map(o =>
            Alias(byName(o.name), o.name)(exprId = o.exprId,
              qualifier = o.qualifier)), lr)
        case _ => r
      }
    }
  }
}

object GraftNativeScanRule {
  /** (table root, version) → native-readable; bounded by live snapshots
    * touched in this JVM (entries are tiny; versions are immutable). */
  private val eligibilityCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Boolean]()
}
