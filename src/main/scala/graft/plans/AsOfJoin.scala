package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BaseOrdering, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, BROADCAST, LogicalPlan, Project, ResolvedHint, SHUFFLE_MERGE}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.internal.SQLConf

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
    rightKeys: Seq[Attribute], rightTime: Attribute,
    tolerance: Option[Long] = None,
    broadcastRight: Boolean = false, forceMerge: Boolean = false) extends BinaryNode {

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

  /** Time types a `tolerance` can be applied to: those with a total
    * order realized by a single integral value — timestamps (micros),
    * dates (days), and the integral primitives. The tolerance is in the
    * column's native unit. */
  def supportsTolerance(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.TimestampType | org.apache.spark.sql.types.TimestampNTZType |
         org.apache.spark.sql.types.DateType => true
    case _ => false
  }

  /** Reads the (single-column, non-null) time row as its native long. */
  def timeAsLong(dt: org.apache.spark.sql.types.DataType): InternalRow => Long = dt match {
    case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType => r => r.getLong(0)
    case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.DateType =>
      r => r.getInt(0).toLong
    case org.apache.spark.sql.types.ShortType => r => r.getShort(0).toLong
    case org.apache.spark.sql.types.ByteType => r => r.getByte(0).toLong
    case other => throw new IllegalStateException(s"tolerance unsupported for ${other.sql}")
  }
}

/** Plans [[AsOfJoinPlan]]: [[BroadcastAsOfJoinExec]] when the right side
  * is explicitly hinted (`broadcast(right)`) or its size estimate is under
  * `spark.sql.autoBroadcastJoinThreshold` — the same size rule the
  * built-in join selection applies — else the shuffle-merge
  * [[AsOfJoinExec]]. Everything else falls through to the built-in
  * strategies. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      val small = threshold >= 0 && j.right.stats.sizeInBytes <= threshold
      if (!j.forceMerge && (j.broadcastRight || small))
        BroadcastAsOfJoinExec(j.leftKeys, j.leftTime, j.rightKeys, j.rightTime,
          j.tolerance, planLater(j.left), planLater(j.right)) :: Nil
      else
        AsOfJoinExec(j.leftKeys, j.leftTime, j.rightKeys, j.rightTime,
          j.tolerance, planLater(j.left), planLater(j.right)) :: Nil
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
    tolerance: Option[Long],
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
    val tol = tolerance

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

      // tolerance: max staleness in the time column's native unit — a
      // candidate older than (leftTime - tolerance) yields null, not a
      // fallback to an even older row (pandas merge_asof semantics)
      val needTol = tol.isDefined
      val tolV = tol.getOrElse(0L)
      val asLong = if (needTol) AsOfJoinPlan.timeAsLong(timeType) else null

      val rBuf = rIter.buffered
      // The as-of candidate: last right row (projected to its value
      // columns) with time <= the current left time, plus the key it
      // belongs to — it stays valid across consecutive left rows of the
      // same key because left times ascend within the partition sort.
      var candVal: InternalRow = null
      var candKey: UnsafeRow = null
      var candTimeLong: Long = 0L

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
                if (needTol) candTimeLong = asLong(rTimeRow)
                rBuf.next()
              } else done = true
            }
          }
          val hit = candVal != null && candKey != null &&
            keyOrd.compare(candKey, lKey) == 0 &&
            (!needTol || asLong(lTimeRow) - candTimeLong <= tolV)
          resultProj(joined(lRow, if (hit) candVal else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of join — the scale-right plan when the right side is
  * tiny (a rates table, a calibration dim): the left side is NOT
  * shuffled or sorted at all (at 100 TB that is the entire cost of the
  * merge form), the right side broadcasts once, and each left partition
  * streams through a per-key binary search over the sorted right rows.
  * DuckDB's ASOF join (the q43/q44 oracle) plans exactly this shape when
  * the build side is small.
  *
  * Same semantics as [[AsOfJoinExec]]: latest `rightTime <= leftTime`
  * per equal key, ties at equal time match, null keys/times never match,
  * left-outer nulls. Left partitioning/ordering pass straight through —
  * the operator adds no exchange anywhere.
  */
/** Executor-local cache of built broadcast as-of indexes: every task on
  * an executor reuses ONE grouped-and-sorted index per (broadcast,
  * projection) instead of rebuilding it per partition — with hundreds of
  * partitions per executor that turns O(parts × R log R) build work into
  * O(R log R). Bounded LRU; entries are bounded by the broadcast
  * threshold and die with the executor JVM. */
private[plans] object AsOfIndexCache {
  private val MaxEntries = 8
  // Soft references: cache keys embed per-execution broadcast/expr ids,
  // so entries are garbage once their query finishes — the LRU bounds
  // entry COUNT, the soft refs let the GC reclaim the (broadcast-sized)
  // index payloads under memory pressure instead of pinning them for
  // the executor's lifetime.
  private val cache =
    new java.util.LinkedHashMap[String, java.lang.ref.SoftReference[AnyRef]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.lang.ref.SoftReference[AnyRef]]): Boolean =
        size() > MaxEntries
    }
  def getOrBuild(key: String, build: () => AnyRef): AnyRef = cache.synchronized {
    val got = cache.get(key)
    val v = if (got == null) null else got.get()
    if (v != null) v
    else { val built = build(); cache.put(key, new java.lang.ref.SoftReference[AnyRef](built)); built }
  }
}

case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Attribute], leftTime: Attribute,
    rightKeys: Seq[Attribute], rightTime: Attribute,
    tolerance: Option[Long],
    left: SparkPlan, right: SparkPlan) extends SparkPlan with BinaryExecNode {

  private def rightValues: Seq[Attribute] =
    AsOfJoinPlan.rightValues(right.output, rightKeys, rightTime)

  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

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
    val tol = tolerance
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    // cache key: broadcast id + this node's projection of it (the same
    // exchange can be reused by a different as-of join with different
    // key/time columns — those must not share an index)
    val cacheKey = s"${bcast.id}:${rKeys.map(_.exprId.id).mkString(",")}:" +
      s"${rTime.exprId.id}:${rVals.map(_.exprId.id).mkString(",")}"

    left.execute().mapPartitions { lIter =>
      val timeOrd: BaseOrdering = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      // Key → right rows as (time, values) sorted by time, built ONCE per
      // executor (AsOfIndexCache) from the executor-local broadcast value:
      // O(R log R) on a side already bounded by the broadcast threshold.
      // Null key/time rows can never match, so they never enter the index.
      val index = AsOfIndexCache.getOrBuild(cacheKey, () => {
        val rKeyProj = UnsafeProjection.create(rKeys, rOut)
        val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
        val rValProj = UnsafeProjection.create(rVals, rOut)
        val grouped = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)]]()
        bcast.value.foreach { r =>
          val k = rKeyProj(r)
          val t = rTimeProj(r)
          if (!k.anyNull && !t.isNullAt(0)) {
            var buf = grouped.get(k)
            if (buf == null) {
              buf = scala.collection.mutable.ArrayBuffer.empty
              grouped.put(k.copy(), buf)
            }
            buf += ((t.copy(), rValProj(r).copy()))
          }
        }
        val pairOrd: Ordering[(UnsafeRow, UnsafeRow)] =
          (a: (UnsafeRow, UnsafeRow), b: (UnsafeRow, UnsafeRow)) => timeOrd.compare(a._1, b._1)
        val built = new java.util.HashMap[UnsafeRow, Array[(UnsafeRow, UnsafeRow)]](grouped.size())
        grouped.forEach { (k, buf) => built.put(k, buf.sortInPlace()(pairOrd).toArray) }
        built
      }).asInstanceOf[java.util.HashMap[UnsafeRow, Array[(UnsafeRow, UnsafeRow)]]]

      val needTol = tol.isDefined
      val tolV = tol.getOrElse(0L)
      val asLong = if (needTol) AsOfJoinPlan.timeAsLong(timeType) else null
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      // nullable binding for the same reason as the merge exec
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rVals.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rVals.length)
      val joined = new JoinedRow

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow)
        var hit: InternalRow = null
        if (!lKey.anyNull && !lTimeRow.isNullAt(0)) {
          val arr = index.get(lKey)
          if (arr != null) {
            // greatest right time <= left time
            var lo = 0; var hi = arr.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (timeOrd.compare(arr(mid)._1, lTimeRow) <= 0) { ans = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            if (ans >= 0 &&
                (!needTol || asLong(lTimeRow) - asLong(arr(ans)._1) <= tolV))
              hit = arr(ans)._2
          }
        }
        resultProj(joined(lRow, if (hit != null) hit else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Column-level API for the native as-of join. */
object AsOf {

  /** Install the planner strategy on sessions not built with
    * [[GraftExtensions]]. Driver-owned-session entry points call this
    * once at session setup ([[graft.Sessions.tune]]) — deliberately NOT
    * called from [[join]]: mutating `experimental.extraStrategies` from
    * inside a column-API call would be session-global state sneaking in
    * on the query path. Idempotent; a duplicate of the injected strategy
    * is harmless — the planner takes the first candidate plan and both
    * produce the same one. */
  def ensureInstalled(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** For every `left` row, append the value columns of the `right` row
    * with equal `keys` and the greatest `rightTime <= leftTime`
    * (left-outer: nulls when none). Key columns must have identical
    * names/types on both sides; `right`'s key and time columns are not
    * duplicated into the output.
    *
    * Passing `broadcast(right)` pins the broadcast physical form (left
    * side untouched — no shuffle, no sort); otherwise
    * [[AsOfJoinStrategy]] picks broadcast vs shuffle-merge by the right
    * side's size estimate, like built-in join selection.
    *
    * `tolerance` bounds staleness (pandas `merge_asof` semantics): a
    * match only counts when `leftTime - rightTime <= tolerance`, in the
    * time column's native unit (micros for timestamps, days for dates);
    * a fresher-than-nothing candidate outside the bound yields null, it
    * does NOT fall back to an older row. Integral/timestamp/date time
    * columns only.
    *
    * The planner strategy must be installed on the session
    * ([[GraftExtensions]], or [[ensureInstalled]] at session setup). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           tolerance: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    // fail fast with a pointer instead of the planner's opaque
    // "no plan for AsOfJoinPlan" assertion at execution time
    // (planner.strategies covers both the GraftExtensions injection and
    // the experimental ensureInstalled path)
    require(Bridge.plannerStrategies(spark).contains(AsOfJoinStrategy),
      "as-of join: planner strategy not installed on this session — build it " +
        "with GraftExtensions or call AsOf.ensureInstalled(spark) at session setup")
    val lPlan = left.queryExecution.analyzed
    // Self-join dedup (what the analyzer's DeduplicateRelations does for
    // built-in Join nodes): if both sides descend from the same relation
    // they share attribute exprIds, and one exprId meaning two different
    // columns inside one node breaks every exprId-keyed rule (column
    // pruning silently emptied the right child). Re-alias the whole right
    // output so its exprIds are fresh.
    // A top-level hint on the right side pins the physical form:
    // `broadcast(right)` → broadcast exec; `right.hint("merge")` → the
    // shuffle-merge exec even when the size estimate is broadcastable
    // (the scale-out encoding when the small estimate won't hold in
    // production). The hint node itself is consumed here (it would
    // otherwise sit meaninglessly inside our custom node).
    val (rPlanRaw, rHinted, rMerge) = right.queryExecution.analyzed match {
      case ResolvedHint(child, hints) if hints.strategy.contains(BROADCAST) =>
        (child, true, false)
      case ResolvedHint(child, hints) if hints.strategy.contains(SHUFFLE_MERGE) =>
        (child, false, true)
      case p => (p, false, false)
    }
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
    tolerance.foreach { t =>
      require(t >= 0, s"as-of join: tolerance must be non-negative, got $t")
      require(AsOfJoinPlan.supportsTolerance(lt.dataType),
        s"as-of join: tolerance unsupported for time type ${lt.dataType.sql}")
    }
    Bridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan, lk, lt, rk, rt,
      tolerance = tolerance, broadcastRight = rHinted, forceMerge = rMerge))
  }
}
