package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftInternalAccess, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Whole-operator extension tier (SURVEY §2.10 escalation path (c)): a
  * native as-of join as a first-class Catalyst operator — logical node +
  * planner strategy + physical sort-merge exec — the one extension tier
  * the expression/rule work ([[VecDotRewrite]], `VecDotExpr`) doesn't
  * cover. All three pandas `merge_asof` directions plus tolerance:
  *
  *  - `backward` (default): the right row with the LARGEST time <=
  *    left-time (inclusive);
  *  - `forward`: the right row with the SMALLEST time >= left-time;
  *  - `nearest`: whichever of the two is closer in time, ties to the
  *    backward side;
  *  - `tolerance`: optional bound (in the time type's native units, e.g.
  *    microseconds for timestamps) on the admissible |right - left| gap —
  *    the feature-store staleness guard.
  *
  * Rows with a NULL key or NULL time on either side never match (SQL
  * equi-join null semantics). Inner flavor: unmatched left rows are
  * dropped, mirroring `rel/Joins.joinAsof*`, whose DuckDB oracles the
  * native variants share.
  *
  * Why a physical operator at all: Spark itself has a logical
  * `AsOfJoin` (pandas-on-Spark API) but REWRITES it to the union +
  * ordered-window form before planning (catalyst RewriteAsOfJoin) — the
  * same formulation `rel/Joins.joinAsof` uses. That shape is already
  * one-shuffle/linear, but it sorts the UNION of both inputs as one
  * sequence and carries window state over it. The native exec instead
  * declares `ClusteredDistribution`/`SortOrder` requirements per child and
  * merges the two sorted streams directly: each side shuffles ONCE on its
  * own key, the merge is a single forward pass with O(1) state (current
  * lookahead + at most one copied candidate), and — unlike the window
  * form — the right side never re-sorts interleaved with left rows, no
  * NULL-padded union columns are materialized, and no window-function
  * state machine runs per row.
  *
  * 100-TB shape: EnsureRequirements co-partitions both children
  * (`HashPartitioning` on the respective keys, equal partition counts —
  * the same contract SortMergeJoinExec plans under), so the merge is
  * executor-local with zero extra exchanges; AQE may coalesce the two
  * shuffles but `ValidateRequirements` re-checks this node's distribution
  * + ordering before accepting any runtime change. Skewed keys degrade to
  * a long sorted run per reducer, never a pair explosion — per-left-row
  * work stays O(1) amortized in every direction.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    direction: String,
    tolerance: Option[Long]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]. Injected per-session via
  * `spark.experimental.extraStrategies` (done lazily by [[AsOf.join]]) or
  * cluster-wide with `spark.sql.extensions=graft.GraftExtensions`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, dir, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, dir, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge as-of join. Requires each child clustered on its
  * keys and sorted by (keys, time) ascending — EnsureRequirements inserts
  * the (single) exchange + sort per side. Per partition: one simultaneous
  * forward pass over the two sorted iterators; the only per-key state is
  * the backward candidate (one copied row) and the lookahead, which
  * doubles as the forward candidate. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    direction: String,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  require(Seq("backward", "forward", "nearest").contains(direction),
    s"unknown as-of direction '$direction'")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of join key types differ: ${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
  require(tolerance.forall(_ >= 0), "as-of tolerance must be non-negative")
  // nearest/tolerance need the time DIFFERENCE, so the time type must have
  // a long-representable physical form (timestamps are micros, dates days)
  private def needsLongTime = direction == "nearest" || tolerance.isDefined
  require(!needsLongTime || (leftTime.dataType match {
    case TimestampType | TimestampNTZType | LongType | DateType | IntegerType | ShortType => true
    case _ => false
  }), s"direction=$direction/tolerance needs a long-representable time type, " +
    s"got ${leftTime.dataType}")

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // the merge emits left rows in their incoming (keys, time) order
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def simpleString(maxFields: Int): String =
    s"AsOfJoin [${leftKeys.mkString(", ")}], [${rightKeys.mkString(", ")}], " +
      s"$leftTime asof $rightTime, direction=$direction" +
      tolerance.map(t => s", tolerance=$t").getOrElse("")

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outAttrs = output
    val dir = direction
    val tol = tolerance

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyGen = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyGen = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeGen = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeGen = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeExpr.dataType))
      val timeAsLong: InternalRow => Long = lTimeExpr.dataType match {
        case TimestampType | TimestampNTZType | LongType => r => r.getLong(0)
        case DateType | IntegerType => r => r.getInt(0).toLong
        case ShortType => r => r.getShort(0).toLong
        case _ => r => 0L // unused: guarded by the constructor require
      }
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      // right-side lookahead (projection buffers stay valid until the next
      // rKeyGen/rTimeGen call, which only happens when the lookahead moves)
      var rHead: InternalRow = null
      var rHeadKey: InternalRow = null
      var rHeadTime: InternalRow = null
      // backward candidate: the latest right row whose key is candKey and
      // whose time was <= the left time current when it was installed;
      // child iterators reuse row buffers, so all three are copies
      var candRow: InternalRow = null
      var candKey: InternalRow = null
      var candTime: InternalRow = null

      def advanceRight(): Unit = {
        rHead = null
        while (rHead == null && rIter.hasNext) {
          val r = rIter.next()
          val k = rKeyGen(r)
          if (!k.anyNull) {
            val t = rTimeGen(r)
            if (!t.isNullAt(0)) { rHead = r; rHeadKey = k; rHeadTime = t }
          }
        }
      }
      advanceRight()

      new Iterator[InternalRow] {
        private var ready: InternalRow = null

        // consume right rows behind the current left row; in backward /
        // nearest mode rows with time <= lt become the candidate (copied),
        // in forward mode rows with time < lt are simply passed
        private def consume(lk: InternalRow, lt: InternalRow): Unit = {
          var scanning = true
          while (scanning && rHead != null) {
            val c = keyOrd.compare(rHeadKey, lk)
            if (c < 0) advanceRight()
            else if (c == 0 && dir == "forward" && timeOrd.compare(rHeadTime, lt) < 0)
              advanceRight()
            else if (c == 0 && dir != "forward" && timeOrd.compare(rHeadTime, lt) <= 0) {
              candRow = rHead.copy(); candKey = rHeadKey.copy(); candTime = rHeadTime.copy()
              advanceRight()
            } else scanning = false
          }
        }

        private def withinTol(gap: Long): Boolean = tol.forall(gap <= _)

        private def findNext(): InternalRow = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyGen(l)
            if (!lk.anyNull) {
              val lt = lTimeGen(l)
              if (!lt.isNullAt(0)) {
                consume(lk, lt)
                val back =
                  if (dir != "forward" && candRow != null && keyOrd.compare(candKey, lk) == 0 &&
                      (tol.isEmpty || withinTol(timeAsLong(lt) - timeAsLong(candTime))))
                    candRow else null
                val fwd =
                  if (dir != "backward" && rHead != null && keyOrd.compare(rHeadKey, lk) == 0 &&
                      (tol.isEmpty || withinTol(timeAsLong(rHeadTime) - timeAsLong(lt))))
                    rHead else null
                val m = dir match {
                  case "backward" => back
                  case "forward" => fwd
                  case "nearest" =>
                    if (back == null) fwd
                    else if (fwd == null) back
                    // ties go backward: <= on the two absolute gaps
                    else if (timeAsLong(lt) - timeAsLong(candTime) <=
                             timeAsLong(rHeadTime) - timeAsLong(lt)) back
                    else fwd
                }
                if (m != null) {
                  numOutputRows += 1
                  return resultProj(joined(l, m))
                }
              }
            }
          }
          null
        }

        override def hasNext: Boolean = {
          if (ready == null) ready = findNext()
          ready != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty as-of join iterator")
          val r = ready
          ready = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Public entry point: `AsOf.join(purchases, signups, Seq("user_id"),
  * Seq("s_user"), "ts", "s_ts")` (+ optional `direction`, `tolerance`).
  * Column-name-based on purpose — the node is built directly over the two
  * ANALYZED child plans, so names resolve exactly once, here. The right
  * side is re-aliased through fresh `Alias`es so a self-join (both sides
  * reading the same table, hence the same expression IDs) stays
  * unambiguous without relying on analyzer deduplication reaching inside
  * a node it doesn't know. */
object AsOf {
  def ensureRegistered(spark: SparkSession): Unit = {
    val e = spark.experimental
    if (!e.extraStrategies.contains(AsOfJoinStrategy))
      e.extraStrategies = e.extraStrategies :+ AsOfJoinStrategy
  }

  def join(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      "as-of join needs one or more key columns, matched pairwise")
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    val rAnalyzed = right.queryExecution.analyzed
    val aliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(aliases, rAnalyzed)
    val rAttrs = aliases.map(_.toAttribute)
    def attr(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"as-of join column '$n' not found among ${out.map(_.name).mkString(", ")}"))
    val node = AsOfJoin(lPlan, rPlan,
      leftKeys.map(attr(lPlan.output, _)), rightKeys.map(attr(rAttrs, _)),
      attr(lPlan.output, leftTime), attr(rAttrs, rightTime),
      direction, tolerance)
    GraftInternalAccess.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
  }
}
