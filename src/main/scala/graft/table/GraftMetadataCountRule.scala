package graft.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Metadata-only aggregates (round-15 verdict task 2, Delta/Iceberg's
  * `OptimizeMetadataOnlyQuery` analog): a global `COUNT(*)` — and
  * `MIN`/`MAX` over stats-covered columns — over a graft table answers
  * from the MANIFEST. Every entry records its file's exact footer row
  * count, its deletion vector's cardinality, and per-column min/max, so
  * `Σ liveRows` (and the fold of the per-file bounds) is the exact scan
  * result at zero data IO. At 100 TB this is the difference between a
  * constant-time answer off one manifest JSON and a full table scan for
  * the most-typed queries in existence.
  *
  * Fires only on the provably-exact shape: a GLOBAL aggregate (no
  * grouping) whose every output is
  *
  *  - `count(*)`/`count(1)` — never `count(col)` (null-sensitive; except
  *    where Catalyst itself rewrites it for non-nullable columns), never
  *    DISTINCT, never FILTER — exact even across deletion vectors
  *    (that is what the manifest-carried `dvRows` is for); or
  *  - `min(col)`/`max(col)` where EVERY file covers `col` with an exact
  *    stat kind — integral ("long"), date, or epoch timestamps — or is
  *    provably all-null in it, or carries it as an identity partition
  *    value. Strings are excluded (max stats are truncated-incremented
  *    bounds, not witnesses) and so are float/double (parquet stats
  *    ignore NaN, which Spark's MAX must rank highest); any deletion
  *    vector disables min/max (the masked row could be the extremum).
  *
  * The plan sits directly on the graft relation through row-preserving
  * Projects only (no Filter in between: a filtered aggregate must scan).
  * The rewrite is value-equivalent to execution, so it is safe anywhere
  * the shape appears, subqueries included. Matches BOTH renderings of a
  * graft read: the DSv2 relation and the converted native file-source
  * relation ([[GraftNativeScanRule]] — rule order between the two is
  * free).
  */
object GraftMetadataCountRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    org.apache.spark.sql.SparkSession.active.sessionState.conf
      .getConfString("spark.graft.metadataCount", "true").toBoolean

  /** The snapshot behind `plan`, when it IS a plain graft read (through
    * row-preserving Projects). */
  private def snapshotOf(plan: LogicalPlan): Option[TableCommit] = plan match {
    case Project(_, child) => snapshotOf(child) // projects keep cardinality
    case r: DataSourceV2Relation => r.table match {
      case t: GraftSparkTable if !r.options.containsKey("readChangeFeed") &&
          !r.options.containsKey("changesFrom") &&
          !r.options.containsKey("changesFromTimestamp") =>
        t.resolved.map { case (gt, v) => gt.commitAt(v) }
      case _ => None
    }
    case LogicalRelation(HadoopFsRelation(idx: GraftFileIndex, _, _, _, _, _), _, _, _, _) =>
      Some(idx.snapshotCommit)
    case _ => None
  }

  private sealed trait MetaAgg
  private case object CountStar extends MetaAgg
  private final case class Bound(col: String, dt: DataType, wantMin: Boolean)
      extends MetaAgg

  /** Types whose manifest bounds are exact witnesses (strings excluded:
    * truncated-incremented max; floats excluded: stats ignore NaN). */
  private def exactBoundType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def classify(e: NamedExpression): Option[MetaAgg] = e match {
    case Alias(AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _), _)
        if v != null => Some(CountStar)
    case Alias(AggregateExpression(Min(a: AttributeReference), _, false, None, _), _)
        if exactBoundType(a.dataType) =>
      Some(Bound(a.name, a.dataType, wantMin = true))
    case Alias(AggregateExpression(Max(a: AttributeReference), _, false, None, _), _)
        if exactBoundType(a.dataType) =>
      Some(Bound(a.name, a.dataType, wantMin = false))
    case _ => None
  }

  /** Exact stat kinds per column type — the (kind, type) pairs whose
    * manifest bounds are true witnesses. Returns the internal value. */
  private def statValue(kind: String, bound: String, dt: DataType): Option[Any] =
    scala.util.Try {
      (kind, dt) match {
        case ("long", LongType) => BigDecimal(bound).toLongExact
        case ("long", IntegerType) => BigDecimal(bound).toIntExact
        case ("long", ShortType) => BigDecimal(bound).toShortExact
        case ("long", ByteType) => BigDecimal(bound).toByteExact
        case ("date", DateType) => BigDecimal(bound).toIntExact
        case ("ts-micros", TimestampType | TimestampNTZType) =>
          BigDecimal(bound).toLongExact
        case ("ts-millis", TimestampType | TimestampNTZType) =>
          BigDecimal(bound).toLongExact * 1000L
        case _ => throw new IllegalArgumentException(kind)
      }
    }.toOption

  /** MIN/MAX of `colName` straight off the manifest: outer None = cannot
    * answer exactly (fall back to the scan); Some(None) = SQL NULL (zero
    * live non-null rows). */
  private def metaBound(c: TableCommit, b: Bound): Option[Option[Any]] = {
    if (c.files.exists(_.dv.isDefined)) return None // masked row may be extremum
    val phys = c.phys(b.col)
    val identityPartCol = c.partitionCols.contains(b.col)
    val perFile: Seq[Option[Option[Any]]] = c.files.map { f =>
      if (identityPartCol) f.partition.get(phys) match {
        case Some(GraftTable.HiveNullPartition) => Some(None) // all-null file
        case Some(v) =>
          val cast = Cast(Literal(UTF8String.fromString(v), StringType), b.dt,
            Some(org.apache.spark.sql.SparkSession.active
              .sessionState.conf.sessionLocalTimeZone)).eval(InternalRow.empty)
          if (cast == null) None else Some(Some(cast))
        case None => None // mixed-era file: fall back
      }
      else f.stats.get(phys) match {
        case Some(st) if st.kind == "null-only" => Some(None)
        case Some(st) =>
          statValue(st.kind, if (b.wantMin) st.min else st.max, b.dt)
            .map(v => Some(v))
        case None if f.rows == 0 => Some(None)
        case None => None // stats missing on a non-empty file: scan
      }
    }
    if (perFile.exists(_.isEmpty)) return None
    val vals = perFile.flatten.flatten
    if (vals.isEmpty) return Some(None)
    val ord: Ordering[Any] = ((b.dt: @unchecked) match {
      case LongType | TimestampType | TimestampNTZType =>
        Ordering.Long.on[Any](_.asInstanceOf[Long])
      case IntegerType | DateType => Ordering.Int.on[Any](_.asInstanceOf[Int])
      case ShortType => Ordering.Short.on[Any](_.asInstanceOf[Short])
      case ByteType => Ordering.Byte.on[Any](_.asInstanceOf[Byte])
    })
    Some(Some(if (b.wantMin) vals.min(ord) else vals.max(ord)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(Nil, exprs, child, _) if exprs.nonEmpty &&
          exprs.forall(e => classify(e).isDefined) =>
        snapshotOf(child) match {
          case Some(c) =>
            val rows = c.files.map(_.liveRows).sum
            // every output must resolve exactly, or the whole aggregate scans
            val resolved: Seq[Option[Option[Any]]] =
              exprs.map(e => classify(e).get match {
                case CountStar => Some(Some(rows))
                case b: Bound => metaBound(c, b)
              })
            if (resolved.forall(_.isDefined))
              LocalRelation(agg.output.map(_.toAttribute),
                Seq(InternalRow.fromSeq(resolved.map(_.get.orNull))))
            else agg
          case None => agg
        }
    }
  }
}
