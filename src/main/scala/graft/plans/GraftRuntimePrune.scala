package graft.plans

import graft.sources.{GraftRuntimePruneSpec, GraftScan}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}

/** RUNTIME (join-driven) partition pruning for the SQL catalog — the
  * manifest-level analogue of Spark's dynamic partition pruning, wired
  * for the V1-bridged [[GraftScan]]:
  *
  * {{{
  *   SELECT ... FROM graft.db.fact f
  *   JOIN (SELECT k, ... FROM dim WHERE dim.attr = ...) d
  *     ON f.part_col = d.k          -- part_col = the fact's partition column
  * }}}
  *
  * keeps only the fact partitions whose values survive the dim's
  * filter — partitions the dim excludes are never listed or opened. At
  * 100 TB this is the difference between reading 5/25 partitions and
  * 25/25: the static pushdown path can't see the dim's keys at plan
  * time, and Spark's own DPP machinery (`SupportsRuntimeV2Filtering`)
  * only reaches `BatchScanExec` — a V1-bridged scan plans as
  * `RowDataSourceScanExec`, where a runtime filter would evaluate
  * per-row ABOVE the full scan. So the rule attaches the obligation to
  * the scan itself ([[GraftRuntimePruneSpec]]): at execution planning
  * the scan resolves the dim side's DISTINCT join keys driver-side
  * (dimension-key-count-sized — the side the planner broadcasts
  * anyway; Spark's own non-reuse DPP subquery makes the same trade)
  * and prunes the manifest, exactly the [[graft.operators
  * .PartitionedTable.readJoinPruned]] semantic, planner-driven.
  *
  * SOUNDNESS: pruning only ever drops partitions whose value cannot
  * equal any dim key — for an equi-join under INNER/LEFT-SEMI, such
  * fact rows cannot survive the join (null keys never match). The join
  * condition itself still evaluates in full above the scan, so an
  * over-wide value set only costs IO, never correctness; resolution
  * failure or an over-cap dim falls back to the unpruned scan.
  *
  * GUARDS (the Spark DPP posture): fires only when the join key IS the
  * fact scan's partition-column attribute (exprId-matched through the
  * fact side, so aliases/derivations never misbind), the dim side is
  * deterministic, carries a selective filter, and estimates small
  * (`spark.graft.runtimePruning.maxDimBytes`, default 256 MB — the dim
  * executes twice: once collected for pruning, once in the join).
  * `spark.graft.runtimePruning.enabled=false` disables the rewrite
  * (the A/B every pruning claim is tested against). Runs in the
  * user-provided batch — after pushdown built the scan it rewrites.
  */
case class GraftRuntimePrune() extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean = SparkSession.active.conf
    .getOption("spark.graft.runtimePruning.enabled")
    .forall(_.toBoolean)

  private def maxDimBytes: Long = SparkSession.active.conf
    .getOption("spark.graft.runtimePruning.maxDimBytes")
    .map(_.toLong).getOrElse(256L << 20)

  /** Share ONE cached execution of a stored dim between the pruning
    * collect and the join (default on). */
  private def reuseDim: Boolean = SparkSession.active.conf
    .getOption("spark.graft.runtimePruning.reuseDim")
    .forall(_.toBoolean)

  /** The fact-side scan relation exporting attribute `a` as a
    * PRUNABLE column — its partition column, or (for a generated
    * table, single-rule or multi-level) a generation rule's SOURCE
    * column, the calendar-dim star shape — not already carrying an
    * obligation. The returned option is [[GraftRuntimePruneSpec
    * .srcCol]]: None = partition-keyed, Some = source-keyed.
    *
    * The walk from the join down to the scan admits ONLY
    * row-preserving-by-partition operators (the Spark DPP
    * `getFilterableTableScan` posture): Project, Filter, and an
    * Aggregate whose grouping keys include `a` (pruning drops WHOLE
    * groups whose key cannot join — surviving groups keep every row,
    * so their aggregate values are untouched). Anything else on the
    * path — Limit, Offset, Sample, Window, Sort-with-limit, nested
    * joins — bails out: e.g. `(SELECT * FROM fact LIMIT 100) f JOIN
    * dim` must keep the SAME 100-row prefix the unpruned scan feeds,
    * and pruning under the Limit would change which rows it keeps. */
  private def factScanOf(side: LogicalPlan, a: AttributeReference)
      : Option[(DataSourceV2ScanRelation, V1ScanWrapper, GraftScan,
        Option[String])] = {
    @scala.annotation.tailrec
    def walk(p: LogicalPlan): Option[DataSourceV2ScanRelation] = p match {
      case r @ DataSourceV2ScanRelation(_, w: V1ScanWrapper, _, _, _)
          if w.v1Scan.isInstanceOf[GraftScan] &&
            r.output.exists(_.exprId == a.exprId) &&
            w.v1Scan.asInstanceOf[GraftScan].runtimePrune.isEmpty =>
        Some(r)
      case pr: Project => walk(pr.child)
      case f: Filter => walk(f.child)
      case ag: Aggregate if ag.groupingExpressions.exists {
            case g: AttributeReference => g.exprId == a.exprId
            case _ => false
          } => walk(ag.child)
      case _ => None
    }
    walk(side).flatMap { r =>
      val w = r.scan.asInstanceOf[V1ScanWrapper]
      val gs = w.v1Scan.asInstanceOf[GraftScan]
      if (gs.spec.partCol.contains(a.name)) Some((r, w, gs, None))
      else {
        // generated table joined on a SOURCE column — one manifest-dir
        // metadata read at optimize time, only reached when a graft
        // scan matched the key's exprId. Multi-level tables admit any
        // level's source column (the status×year star shape).
        val spark = SparkSession.active
        val sourceCols: Set[String] =
          try {
            val levels = graft.operators.PartitionedTable
              .generatedLevelsOf(spark, gs.spec.dir)
            levels.map(_.map(_.srcCol).toSet).getOrElse(
              graft.operators.PartitionedTable
                .generatedBy(spark, gs.spec.dir).map(_._1).toSet)
          } catch { case scala.util.control.NonFatal(_) => Set.empty }
        if (sourceCols.contains(a.name)) Some((r, w, gs, Some(a.name)))
        else None
      }
    }
  }

  /** The Spark DPP bar for "worth pruning by": some filter in the dim
    * subtree that is likely selective. */
  private def hasSelectivePredicate(plan: LogicalPlan): Boolean =
    plan.exists {
      case f: Filter => isLikelySelective(f.condition)
      case _ => false
    }

  /** A dim whose leaves are all LOCAL relations is prunable without
    * the selectivity bar: its key set is already driver-materialized
    * (a literal key list / small fixture — the earlier optimizer
    * batches constant-fold any Filter over it away, so the bar could
    * never be met), and collecting it costs nothing. The selectivity
    * requirement exists to justify scanning a STORED dim twice. */
  private def allLocal(plan: LogicalPlan): Boolean =
    plan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])

  private def dimOk(dim: LogicalPlan): Boolean =
    dim.deterministic &&
      (hasSelectivePredicate(dim) || allLocal(dim)) &&
      dim.stats.sizeInBytes <= maxDimBytes

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case j @ Join(left, right, joinType, Some(cond), _)
          if joinType == Inner || joinType == LeftSemi =>
        val pairs = splitConjunctivePredicates(cond).collect {
          case EqualTo(a: AttributeReference, b) => (a, b)
          case EqualTo(b, a: AttributeReference) => (a, b)
        }
        // first prunable (factAttr, dimKeyExpr) orientation wins; the
        // symmetric fact-on-the-right case only for INNER (a LEFT SEMI
        // preserves left rows — pruning its left by dim keys is the
        // supported direction, pruning the RIGHT by left keys is too,
        // but the right side's rows only gate existence; keep it
        // simple and sound: fact-left for semi)
        val candidates = pairs.flatMap { case (a, b) =>
          val leftFact =
            if (a.references.subsetOf(left.outputSet) &&
              b.references.subsetOf(right.outputSet))
              factScanOf(left, a).map((_, b, right, true))
            else None
          val rightFact =
            if (joinType == Inner && a.references.subsetOf(right.outputSet) &&
              b.references.subsetOf(left.outputSet))
              factScanOf(right, a).map((_, b, left, false))
            else None
          leftFact.orElse(rightFact)
        }
        candidates.find { case (_, _, dim, _) => dimOk(dim) } match {
          case None => j
          case Some(((rel, w, gs, srcCol), keyExpr: Expression, dim,
              factOnLeft)) =>
            // Execute the STORED dim once, not twice: the obligation's
            // key-resolution collect and the join itself both read the
            // dim — route BOTH through one cached InMemoryRelation
            // (the collect materializes it, the join reads it), so the
            // 256 MB-cap worst case never scans the dim's source
            // twice. All-local dims skip the cache (their keys are
            // already driver-materialized); any caching failure keeps
            // the original plan on both legs — reuse is an
            // optimization, never a dependency.
            val dimShared: LogicalPlan =
              if (allLocal(dim) || !reuseDim) dim
              else try org.apache.spark.sql.graft.Bridge
                .cachedPlanOf(SparkSession.active, dim).getOrElse(dim)
              catch { case scala.util.control.NonFatal(_) => dim }
            val pruned = gs.copy(runtimePrune =
              Some(GraftRuntimePruneSpec(dimShared, keyExpr, srcCol)))
            val newWrapper = new StatsV1ScanWrapper(V1ScanWrapper(
              pruned, w.handledFilters, w.pushedDownOperators))
            def rewrite(side: LogicalPlan): LogicalPlan =
              side.transformDown {
                case r: DataSourceV2ScanRelation if r eq rel =>
                  r.copy(scan = newWrapper)
              }
            if (factOnLeft)
              j.copy(left = rewrite(left), right = dimShared)
            else j.copy(left = dimShared, right = rewrite(right))
        }
    }
  }
}

object GraftRuntimePrune {
  /** Post-hoc installation (the [[GraftScanStats]] pattern — extension
    * hooks all run before pushdown builds the wrapper this rewrites);
    * idempotent. */
  def ensureInstalled(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[GraftRuntimePrune]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GraftRuntimePrune()
}
