package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}

/** A [[V1ScanWrapper]] that FORWARDS the wrapped scan's statistics.
  *
  * Spark's `V2ScanRelationPushDown` wraps every [[org.apache.spark.sql
  * .connector.read.V1Scan]] in a plain `V1ScanWrapper`, and
  * `DataSourceV2ScanRelation.computeStats` only consults the wrapper —
  * so a V1-bridged table always reports `defaultSizeInBytes` (≈ +inf)
  * to the planner, and a small dimension table served through the
  * bridge can NEVER auto-broadcast, no matter how accurately the scan
  * itself can size the data. This subclass restores the signal: it is
  * bit-identical to the wrapper it replaces (same fields, same
  * `unapply`, so `DataSourceV2Strategy`'s `V1ScanWrapper` match still
  * fires) plus the one interface `computeStats` looks for.
  */
class StatsV1ScanWrapper(w: V1ScanWrapper)
    extends V1ScanWrapper(w.v1Scan, w.handledFilters, w.pushedDownOperators)
    with SupportsReportStatistics {
  override def estimateStatistics(): Statistics =
    w.v1Scan.asInstanceOf[SupportsReportStatistics].estimateStatistics()
  // NOT equal to the plain wrapper it replaces: the inherited case-class
  // equality would make `transformDown`'s fastEquals check discard the
  // upgraded node as a no-op rewrite and keep the stats-blind original.
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[StatsV1ScanWrapper]
  override def equals(that: Any): Boolean = that match {
    case s: StatsV1ScanWrapper => super.equals(s)
    case _ => false
  }
}

/** Optimizer rule: re-wrap stats-capable V1 scans (graft's SQL catalog
  * scan, [[graft.sources.GraftScan]]) so their manifest-derived sizes
  * reach join planning. At 100 TB this is the difference between a
  * star join against `graft.tpch.region` planning as a shuffle-free
  * BroadcastHashJoin (the plan a user would write by hand) and five
  * full sort-merge shuffles: the size estimate comes straight from the
  * committed manifest's live slices — already restricted to the
  * partitions the scan's pushed predicates kept — so the planner sees
  * the post-pruning size, not the table's.
  *
  * Runs in the user-provided batch (after pushdown created the
  * wrapper, before physical planning reads stats). Idempotent: an
  * already-upgraded wrapper no longer matches.
  */
case class GraftScanStats() extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r @ DataSourceV2ScanRelation(_, w: V1ScanWrapper, _, _, _)
        if w.v1Scan.isInstanceOf[SupportsReportStatistics] &&
          !w.isInstanceOf[StatsV1ScanWrapper] =>
      r.copy(scan = new StatsV1ScanWrapper(w))
  }
}

/** CBO join REORDER at a position where graft statistics are visible.
  *
  * Spark's own "Join Reorder" batch runs BEFORE pushdown builds the
  * `V1ScanWrapper` that [[GraftScanStats]] upgrades (and extension
  * hooks — "Pre CBO Rules" included — run before pushdown too), so at
  * the built-in rule's position every graft relation still reports
  * `defaultSizeInBytes` with no row count and the reorder always
  * skips graft join chains. This re-runs Spark's own
  * `CostBasedJoinReorder` in the post-pushdown user batch, where
  * [[StatsV1ScanWrapper]] has already restored exact row counts and
  * ANALYZE's column NDVs. Self-gating like the original: a no-op
  * unless `spark.sql.cbo.enabled` AND `spark.sql.cbo.joinReorder
  * .enabled`. The DP search is deterministic, so re-costing its own
  * output reproduces it and the fixpoint batch converges. */
case class GraftCboReorder() extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    org.apache.spark.sql.catalyst.optimizer.CostBasedJoinReorder(plan)
}

object GraftScanStats {
  /** Post-hoc installation on an externally-built session (the
    * [[graft.Sessions.tune]] path); idempotent. Installs the
    * stats-aware join reorder with it — the two are one feature: the
    * stats upgrade is what makes the reorder able to see graft
    * tables. */
  def ensureInstalled(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[GraftScanStats]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GraftScanStats()
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[GraftCboReorder]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GraftCboReorder()
  }
}
