package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}
import org.apache.spark.sql.sources.Filter

/** Statistics-forwarding twin of Spark's `V1ScanWrapper`.
  *
  * After pushdown, `V2ScanRelationPushDown` wraps every [[V1Scan]] in a
  * `V1ScanWrapper` so the physical strategy can find the pushed-filter
  * bookkeeping — but the wrapper implements only `Scan`, so a V1-backed
  * scan's [[SupportsReportStatistics]] is INVISIBLE to
  * `DataSourceV2ScanRelation.computeStats`, which pattern-matches the
  * wrapper, not the wrapped scan. Every V1-fallback source therefore
  * reports the unknown-size default (8 EiB) and no join over it can ever
  * auto-broadcast.
  *
  * This subclass keeps the wrapper's whole contract — the strategy's
  * `case V1ScanWrapper(scan, filters, ops)` extractor matches a subclass
  * instance unchanged, so execution planning is untouched — and adds the
  * one missing forward: `estimateStatistics()` delegates to the wrapped
  * scan. Equality is reference-based ON PURPOSE: the swap rule replaces a
  * field-equal node, and Catalyst's `transform` keeps the OLD node
  * whenever the rewritten one compares equal (`fastEquals`), which would
  * silently undo the swap.
  */
final class StatsV1ScanWrapper(
    v1Scan: V1Scan, handledFilters: Seq[Filter],
    pushedDownOperators: PushedDownOperators)
    extends V1ScanWrapper(v1Scan, handledFilters, pushedDownOperators)
    with SupportsReportStatistics {
  override def estimateStatistics(): Statistics =
    v1Scan.asInstanceOf[SupportsReportStatistics].estimateStatistics()
  override def equals(other: Any): Boolean = other match {
    case o: AnyRef => this eq o
    case _ => false
  }
  /** Also reference-based: the PARENT's case-generated `equals` asks the
    * OTHER side `canEqual(this)` — without this override a plain wrapper
    * would still compare equal to its stats twin and `transform` would
    * keep the old node. */
  override def canEqual(other: Any): Boolean = other match {
    case o: AnyRef => this eq o
    case _ => false
  }
  override def hashCode(): Int = System.identityHashCode(this)
}

/** Post-pushdown optimizer rule (injected via `injectPreCBORule`, which
  * runs after the early scan-pushdown batch and before any cost-based
  * decision): wherever the pushdown rule wrapped a stats-reporting
  * [[V1Scan]] in the stats-blind `V1ScanWrapper`, swap in
  * [[StatsV1ScanWrapper]] so `computeStats` sees the scan's
  * manifest-derived size/row estimates. This is what lets a small graft
  * dimension table auto-broadcast under a fact join with NO hint, and
  * gives AQE a truthful starting plan — the logical-plan half of
  * `SupportsReportStatistics` that the V1 fallback otherwise drops.
  */
object ScanStatsRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r: DataSourceV2ScanRelation => r.scan match {
      case w: V1ScanWrapper if !w.isInstanceOf[StatsV1ScanWrapper] &&
          w.v1Scan.isInstanceOf[SupportsReportStatistics] =>
        r.copy(scan = new StatsV1ScanWrapper(
          w.v1Scan, w.handledFilters, w.pushedDownOperators))
      case _ => r
    }
  }
}
