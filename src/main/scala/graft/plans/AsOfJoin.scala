package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BaseOrdering, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge

/** Native as-of join: the whole-operator extension tier (SURVEY §7.3 (c)) —
  * a custom logical node, a planner `Strategy`, and a physical operator
  * with distribution/ordering requirements, wired through
  * `SparkSessionExtensions.injectPlannerStrategy` ([[GraftExtensions]]).
  *
  * Spark has no relational as-of join (the reference engine family and
  * every timeseries store ships one); the composed form
  * ([[graft.operators.TemporalJoins.asofJoin]]) unions both sides through
  * ONE shuffle and replays a window. This native form instead declares
  * `ClusteredDistribution` + sorted `requiredChildOrdering` on each child
  * and streams a sorted-merge with O(1) state per partition:
  *
  *  - EnsureRequirements plans one hash exchange + sort per side — at
  *    100 TB the two sides shuffle independently (no union materialization,
  *    no null-padded struct columns riding the exchange, and a side that
  *    is already partitioned/bucketed by the key shuffles not at all —
  *    impossible in the union encoding, where co-partitioning of the
  *    combined relation can never come from either input's layout).
  *  - The merge holds exactly one candidate right row, not window state;
  *    left rows stream through in arrival order, so `outputOrdering` /
  *    `outputPartitioning` pass through and a downstream groupBy on the
  *    key reuses the exchange.
  *
  * Semantics (= DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`,
  * the oracle for `q43_asof_native`): for every left row, the right row
  * with equal keys and the greatest `rightTime <= leftTime` (ties at equal
  * time match); no candidate → right columns null. Null keys and null
  * times never match (SQL equality/inequality semantics). When several
  * right rows share the same (key, time), the retained one follows the
  * partition sort order — pre-aggregate the right side to one row per
  * (key, time) for deterministic output, exactly as q36 does.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], leftTime: Attribute,
    rightKeys: Seq[Attribute], rightTime: Attribute) extends BinaryNode {

  /** Right columns carried to the output: everything but the join keys and
    * the time column (recomputed from `right.output`, so generic column
    * pruning under a parent Project narrows this node consistently). */
  def rightValues: Seq[Attribute] = AsOfJoinPlan.rightValues(right.output, rightKeys, rightTime)

  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  def rightValues(
      rightOutput: Seq[Attribute], rightKeys: Seq[Attribute], rightTime: Attribute): Seq[Attribute] =
    rightOutput.filterNot(a =>
      rightKeys.exists(_.exprId == a.exprId) || a.exprId == rightTime.exprId)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; everything else falls
  * through to the built-in strategies. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(j.leftKeys, j.leftTime, j.rightKeys, j.rightTime,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of join. Children arrive co-partitioned on the keys
  * (`ClusteredDistribution`) and sorted by (keys, time) — EnsureRequirements
  * inserts the exchanges/sorts only where the child's existing layout does
  * not already satisfy them. One forward pass per partition; the only
  * retained state is the latest qualifying right row (copied out of the
  * sorter's reused buffer) and its key. */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute], leftTime: Attribute,
    rightKeys: Seq[Attribute], rightTime: Attribute,
    left: SparkPlan, right: SparkPlan) extends SparkPlan with BinaryExecNode {

  private def rightValues: Seq[Attribute] =
    AsOfJoinPlan.rightValues(right.output, rightKeys, rightTime)

  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // Left rows stream through in arrival order with appended right values,
  // so the left child's partitioning and ordering survive — a downstream
  // aggregation on the keys plans with zero additional Exchange.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys; val lTime = leftTime
    val rKeys = rightKeys; val rTime = rightTime
    val rVals = rightValues
    val keyTypes = lKeys.map(_.dataType)
    val timeType = lTime.dataType
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val rValProj = UnsafeProjection.create(rVals, rOut)
      // Bind against NULLABLE right-value attrs: the no-match row is all
      // nulls even when the right column itself is non-nullable, and a
      // projection bound non-nullable would skip the isNull check and
      // read zeros out of the null slots.
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rVals.map(_.withNullability(true)))
      val keyOrd: BaseOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd: BaseOrdering = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullRight = new GenericInternalRow(rVals.length)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      // The as-of candidate: last right row (projected to its value
      // columns) with time <= the current left time, plus the key it
      // belongs to — it stays valid across consecutive left rows of the
      // same key because left times ascend within the partition sort.
      var candVal: InternalRow = null
      var candKey: UnsafeRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow)
        if (lKey.anyNull || lTimeRow.isNullAt(0)) {
          // Null key/time never matches; drain rights sorted before this
          // key so they don't linger (nulls sort first, so these left rows
          // lead the partition and rarely drain anything).
          while (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lKey) < 0) rBuf.next()
          resultProj(joined(lRow, nullRight))
        } else {
          var done = false
          while (!done && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) rBuf.next()
            else if (c > 0) done = true
            else {
              val rTimeRow = rTimeProj(rBuf.head)
              // Null right key/time never matches (nulls compare equal in
              // sort order but not in join semantics); consume and move on.
              if (rKey.anyNull || rTimeRow.isNullAt(0)) rBuf.next()
              else if (timeOrd.compare(rTimeRow, lTimeRow) <= 0) {
                candVal = rValProj(rBuf.head).copy()
                candKey = lKey.copy()
                rBuf.next()
              } else done = true
            }
          }
          val hit = candVal != null && candKey != null && keyOrd.compare(candKey, lKey) == 0
          resultProj(joined(lRow, if (hit) candVal else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Column-level API for the native as-of join. */
object AsOf {

  /** Install the planner strategy on sessions not built with
    * [[GraftExtensions]] (e.g. a driver-owned session). Idempotent; a
    * duplicate of the injected strategy is harmless — the planner takes
    * the first candidate plan and both produce the same one. */
  def ensureInstalled(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** For every `left` row, append the value columns of the `right` row
    * with equal `keys` and the greatest `rightTime <= leftTime`
    * (left-outer: nulls when none). Key columns must have identical
    * names/types on both sides; `right`'s key and time columns are not
    * duplicated into the output. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    ensureInstalled(spark)
    val lPlan = left.queryExecution.analyzed
    // Self-join dedup (what the analyzer's DeduplicateRelations does for
    // built-in Join nodes): if both sides descend from the same relation
    // they share attribute exprIds, and one exprId meaning two different
    // columns inside one node breaks every exprId-keyed rule (column
    // pruning silently emptied the right child). Re-alias the whole right
    // output so its exprIds are fresh.
    val rPlanRaw = right.queryExecution.analyzed
    val rPlan: LogicalPlan =
      if (lPlan.outputSet.intersect(rPlanRaw.outputSet).isEmpty) rPlanRaw
      else Project(rPlanRaw.output.map(a => Alias(a, a.name)(qualifier = a.qualifier)), rPlanRaw)
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of join: column `$name` not found on $side side " +
            s"(${plan.output.map(_.name).mkString(", ")})"))
    val lk = keys.map(attr(lPlan, _, "left"))
    val rk = keys.map(attr(rPlan, _, "right"))
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"as-of join: key `${a.name}` type mismatch: ${a.dataType.sql} vs ${b.dataType.sql}")
    }
    val lt = attr(lPlan, leftTime, "left")
    val rt = attr(rPlan, rightTime, "right")
    require(lt.dataType == rt.dataType,
      s"as-of join: time type mismatch: ${lt.dataType.sql} vs ${rt.dataType.sql}")
    require(RowOrdering.isOrderable(lt.dataType),
      s"as-of join: time type ${lt.dataType.sql} is not orderable")
    Bridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan, lk, lt, rk, rt))
  }
}
