package graft.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, ExprId, Literal, NamedExpression}
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
  * The same fold answers aggregates GROUPED BY identity partition
  * columns — Spark's own `OptimizeMetadataOnlyQuery` shape for catalog
  * tables, served here off the manifest: `GROUP BY dd` (or
  * `SELECT DISTINCT dd`) groups the FILE LIST by its recorded partition
  * values, sums `liveRows` per group, and — crucially — DROPS groups
  * whose live count is zero (an all-deleted partition produces no row
  * from a real scan). Mixed-era files missing a grouped value, or a
  * recorded value that does not cast cleanly to the column type, revert
  * the whole aggregate to the scan (the V1 path keeps such files
  * conservatively; a silent NULL group here would diverge from it).
  *
  * Fires only on the provably-exact shape: every output is
  *
  *  - a bare grouping column (identity partition only — a hidden
  *    transform's source column takes MANY values per file); or
  *  - `count(*)`/`count(1)` — never DISTINCT, never FILTER — exact even
  *    across deletion vectors (that is what the manifest-carried
  *    `dvRows` is for); or
  *  - `count(col)` — null-sensitive, folded as Σ (rows − nulls) off the
  *    manifest's exact per-column null counts (or whole files for
  *    identity partition values); a deletion vector, a pre-upgrade
  *    entry (`nulls == -1`), or a stats-less column reverts to the
  *    scan; or
  *  - `min(col)`/`max(col)` where EVERY file covers `col` with an exact
  *    stat kind — integral ("long"), date, or epoch timestamps — or is
  *    provably all-null in it, or carries it as an identity partition
  *    value. String FILE STATS are excluded (max stats are
  *    truncated-incremented bounds, not witnesses) but string IDENTITY
  *    PARTITION VALUES fold (the exact value itself, compared in UTF-8
  *    binary order — Spark's own string order); float/double are
  *    excluded (parquet stats ignore NaN, which Spark's MAX must rank
  *    highest); any deletion vector disables min/max (the masked row
  *    could be the extremum).
  *
  * The plan sits directly on the graft relation through row-preserving
  * Projects only (no Filter in between: a filtered aggregate must scan).
  * Column identity is tracked by exprId THROUGH the projects down to the
  * relation's own output — a projection that renames or computes a
  * column (`select($"value".as("event_id"))`) can never alias a
  * manifest stat onto the wrong data. The rewrite is value-equivalent to
  * execution, so it is safe anywhere the shape appears, subqueries
  * included. Matches BOTH renderings of a graft read: the DSv2 relation
  * and the converted native file-source relation
  * ([[GraftNativeScanRule]] — rule order between the two is free).
  */
object GraftMetadataCountRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    org.apache.spark.sql.SparkSession.active.sessionState.conf
      .getConfString("spark.graft.metadataCount", "true").toBoolean

  /** The snapshot behind `plan` when it IS a plain graft read through
    * row-preserving Projects, plus the exprId→relation-column map for
    * every aggregate-child attribute that is a PASS-THROUGH of a
    * relation output (renamed or not). Computed projections stay out of
    * the map — they invalidate bounds/grouping on themselves but never
    * the row count. */
  private def snapshotOf(plan: LogicalPlan): Option[(TableCommit, Map[ExprId, String])] =
    plan match {
      case Project(projList, child) => // projects keep cardinality
        snapshotOf(child).map { case (c, m) =>
          val passed = projList.flatMap {
            case a: AttributeReference => m.get(a.exprId).map(a.exprId -> _)
            case al @ Alias(a: AttributeReference, _) =>
              m.get(a.exprId).map(al.exprId -> _)
            case _ => None
          }.toMap
          (c, passed)
        }
      case r: DataSourceV2Relation => r.table match {
        case t: GraftSparkTable if !r.options.containsKey("readChangeFeed") &&
            !r.options.containsKey("changesFrom") &&
            !r.options.containsKey("changesFromTimestamp") =>
          t.resolved.map { case (gt, v) =>
            (gt.commitAt(v), r.output.map(a => a.exprId -> a.name).toMap)
          }
        case _ => None
      }
      case LogicalRelation(HadoopFsRelation(idx: GraftFileIndex, _, _, _, _, _), out, _, _, _) =>
        Some((idx.snapshotCommit, out.map(a => a.exprId -> a.name).toMap))
      case _ => None
    }

  private sealed trait MetaAgg
  private case object CountStar extends MetaAgg
  /** `groupIdx` >= 0: this output IS the grouping column at that index. */
  private final case class GroupKey(groupIdx: Int) extends MetaAgg
  /** `count(col)` — null-sensitive, foldable because every manifest entry
    * records the file's exact per-column null count. */
  private final case class CountCol(col: String) extends MetaAgg
  private final case class Bound(col: String, dt: DataType, wantMin: Boolean)
      extends MetaAgg

  /** Types whose manifest bounds are exact witnesses (strings excluded:
    * truncated-incremented max; floats excluded: stats ignore NaN). */
  private def exactBoundType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def classify(e: NamedExpression, groups: Seq[AttributeReference],
                       rel: Map[ExprId, String]): Option[MetaAgg] = e match {
    case a: AttributeReference if groups.exists(_.exprId == a.exprId) =>
      Some(GroupKey(groups.indexWhere(_.exprId == a.exprId)))
    case Alias(a: AttributeReference, _) if groups.exists(_.exprId == a.exprId) =>
      Some(GroupKey(groups.indexWhere(_.exprId == a.exprId)))
    case Alias(AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _), _)
        if v != null => Some(CountStar)
    case Alias(AggregateExpression(Count(Seq(a: AttributeReference)), _, false, None, _), _) =>
      rel.get(a.exprId).map(CountCol)
    case Alias(AggregateExpression(Min(a: AttributeReference), _, false, None, _), _)
        if exactBoundType(a.dataType) || a.dataType == StringType =>
      rel.get(a.exprId).map(Bound(_, a.dataType, wantMin = true))
    case Alias(AggregateExpression(Max(a: AttributeReference), _, false, None, _), _)
        if exactBoundType(a.dataType) || a.dataType == StringType =>
      rel.get(a.exprId).map(Bound(_, a.dataType, wantMin = false))
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

  /** Cast one recorded partition string to the column type via the
    * engine's Cast; the Hive null marker is a true NULL. Returns
    * Some(value-or-null) on a clean cast, None when the recorded value
    * does not parse (fall back to the scan, which keeps it). */
  private def castPart(v: String, dt: DataType): Option[Any] =
    if (v == GraftTable.HiveNullPartition) Some(null)
    else {
      val cast = Cast(Literal(UTF8String.fromString(v), StringType), dt,
        Some(org.apache.spark.sql.SparkSession.active
          .sessionState.conf.sessionLocalTimeZone)).eval(InternalRow.empty)
      if (cast == null) None else Some(cast)
    }

  /** MIN/MAX of `b.col` over `files`: outer None = cannot answer exactly
    * (fall back to the scan); Some(None) = SQL NULL (zero live non-null
    * rows). Caller has already excluded deletion-vectored snapshots. */
  private def metaBound(c: TableCommit, files: Seq[ManifestFile],
                        b: Bound): Option[Option[Any]] = {
    val phys = c.phys(b.col)
    val identityPartCol = identityPartitionCols(c).contains(b.col)
    // string FILE STATS are truncated-incremented bounds, never
    // witnesses — but a string IDENTITY PARTITION VALUE is the exact
    // (URL-decoded) value itself, so only the partition path may fold
    if (b.dt == StringType && !identityPartCol) return None
    val perFile: Seq[Option[Option[Any]]] = files.map { f =>
      if (identityPartCol) f.partition.get(phys) match {
        case Some(GraftTable.HiveNullPartition) => Some(None) // all-null file
        case Some(v) => castPart(v, b.dt).map(x => Some(x))
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
      case StringType => // UTF8 binary order — Spark's own string order
        Ordering.fromLessThan[Any]((x, y) =>
          x.asInstanceOf[UTF8String].compareTo(y.asInstanceOf[UTF8String]) < 0)
    })
    Some(Some(if (b.wantMin) vals.min(ord) else vals.max(ord)))
  }

  /** `count(col)` over `files`: Σ (rows − nulls) off the manifest's
    * per-column null counts. None = cannot answer exactly — a deletion
    * vector (the masked rows' nullity is unrecorded), a pre-upgrade
    * entry (`nulls == -1`), or a column with no stats entry all revert
    * to the scan. Identity partition values count whole files (the
    * value is constant per file; the Hive null marker contributes 0). */
  private def metaCountCol(c: TableCommit, files: Seq[ManifestFile],
                           colName: String): Option[Long] = {
    if (files.exists(_.dv.isDefined)) return None
    val phys = c.phys(colName)
    val identityPartCol = identityPartitionCols(c).contains(colName)
    val perFile: Seq[Option[Long]] = files.map { f =>
      if (identityPartCol) f.partition.get(phys) match {
        case Some(GraftTable.HiveNullPartition) => Some(0L)
        case Some(_) => Some(f.rows)
        case None => None // mixed-era file: fall back
      }
      else f.stats.get(phys) match {
        case Some(st) if st.kind == "null-only" => Some(0L)
        case Some(st) if st.nulls >= 0L => Some(f.rows - st.nulls)
        case _ if f.rows == 0 => Some(0L)
        case _ => None // nulls unrecorded: scan
      }
    }
    if (perFile.exists(_.isEmpty)) None else Some(perFile.flatten.sum)
  }

  /** The snapshot's IDENTITY partition columns — a `days(ts)` /
    * `bucket(n, id)` spec's SOURCE column is NOT one (a file holds many
    * source values; only the DERIVED value is constant per file). */
  private def identityPartitionCols(c: TableCommit): Set[String] =
    GraftTable.PartTransform.parseAll(c.partitionCols).collect {
      case t: GraftTable.IdentityTransform => t.source
    }.toSet

  /** One fold for both shapes. Global (no grouping): exactly one output
    * row, even over an empty table. Grouped: one row per partition-value
    * tuple with a NONZERO live count — zero-live groups vanish, like the
    * scan's. Returns None to keep the original aggregate. */
  private def fold(c: TableCommit, groups: Seq[AttributeReference],
                   rel: Map[ExprId, String],
                   metas: Seq[MetaAgg]): Option[Seq[InternalRow]] = {
    val hasDv = c.files.exists(_.dv.isDefined)
    if (hasDv && metas.exists(_.isInstanceOf[Bound]))
      return None // the DV-masked row could be the extremum
    if (groups.isEmpty) {
      val rows = c.files.map(_.liveRows).sum
      val resolved = metas.map {
        case CountStar => Some(Some(rows))
        case CountCol(n) => metaCountCol(c, c.files, n).map(v => Some(v))
        case b: Bound => metaBound(c, c.files, b)
        case GroupKey(_) => None // unreachable: no grouping columns exist
      }
      if (resolved.exists(_.isEmpty)) None
      else Some(Seq(InternalRow.fromSeq(resolved.map(_.get.orNull))))
    } else {
      val identity = identityPartitionCols(c)
      // every grouping column must be an identity partition column the
      // relation itself outputs
      val groupCols = groups.map(g => rel.get(g.exprId).filter(identity))
      if (groupCols.exists(_.isEmpty)) return None
      val keys = groupCols.map(_.get).map(c.phys)
      // every file must record a CLEANLY-CAST value for every grouped
      // column (mixed partition eras or unparseable values: scan)
      val decoded: Seq[Option[(Seq[Any], ManifestFile)]] = c.files.map { f =>
        val tuple = keys.zip(groups).map { case (k, g) =>
          f.partition.get(k).flatMap(castPart(_, g.dataType))
        }
        if (tuple.exists(_.isEmpty)) None
        else Some((tuple.map(_.get), f))
      }
      if (decoded.exists(_.isEmpty)) return None
      val byGroup = decoded.flatten.groupBy(_._1)
      // inner Some(None): a group a real scan would not emit (zero live)
      val perGroup: Seq[Option[Option[InternalRow]]] =
        byGroup.toSeq.map { case (tuple, fs) =>
          val files = fs.map(_._2)
          val live = files.map(_.liveRows).sum
          if (live == 0L) Some(None) // an all-deleted partition yields no row
          else {
            val resolved = metas.map {
              case GroupKey(i) => Some(Some(tuple(i)))
              case CountStar => Some(Some(live))
              case CountCol(n) => metaCountCol(c, files, n).map(v => Some(v))
              case b: Bound => metaBound(c, files, b)
            }
            if (resolved.exists(_.isEmpty)) None
            else Some(Some(InternalRow.fromSeq(resolved.map(_.get.orNull))))
          }
        }
      if (perGroup.exists(_.isEmpty)) None
      else Some(perGroup.flatten.flatten)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(groups, exprs, child, _) if exprs.nonEmpty &&
          groups.forall(_.isInstanceOf[AttributeReference]) =>
        snapshotOf(child) match {
          case Some((c, rel)) =>
            val groupAttrs = groups.map(_.asInstanceOf[AttributeReference])
            val metas = exprs.map(e => classify(e, groupAttrs, rel))
            if (metas.exists(_.isEmpty)) agg
            else fold(c, groupAttrs, rel, metas.map(_.get)) match {
              case Some(rows) =>
                LocalRelation(agg.output.map(_.toAttribute), rows)
              case None => agg
            }
          case None => agg
        }
    }
  }
}
