package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DateType, IntegerType, LongType, TimestampType}

/** Banded range-join rewrite — the optimizer-rule form of
  * [[graft.operators.TemporalJoins.rangeJoin]]: an inner join whose ONLY
  * cross-side condition is point-in-interval
  * (`p >= lo AND p <= hi`, any conjunct order, `<`/`<=` both accepted)
  * has no equi key, so Spark can only plan it as a broadcast/cartesian
  * nested loop — |points|×|intervals| comparisons, the classic range-join
  * blowup. With `spark.graft.rangeJoin.binSize` set (> 0, in the column's
  * native units), this rule rewrites the join declaratively:
  *
  *   intervals  →  Generate(explode(sequence(fd(lo), fd(hi))))  — one row
  *                 per fixed-width bucket the interval overlaps
  *   join cond  →  fd(p) = bucket  AND  <original condition>
  *
  * where `fd(x) = (x − pmod(x, w)) div w` is an exact sign-correct floor
  * division (pmod is non-negative, the subtraction makes the dividend an
  * exact multiple — no double rounding, negatives band correctly). The
  * equi conjunct gives the planner a shuffle key, so the join runs as a
  * hash/merge join whose work scales with rows-per-bucket, and the
  * original predicate survives as the residual filter — results are
  * row-identical to the nested loop (`BandedRangeJoinSpec` asserts both
  * directions).
  *
  * Scope guards (each skips the rewrite): an existing cross-side equality
  * (the join already has a key), a point/bound type outside
  * int/long/date/timestamp (banding needs exact integral floor-div after
  * a monotonic conversion), or bounds not both coming from the one other
  * side. The rewrite runs once — its own output contains a cross-side
  * equality, so the fixed-point optimizer batch can't re-match it.
  *
  * Bucket width is the operator's explicit choice, exactly like the
  * manual form's `bucketWidth`: width near the typical interval span
  * keeps the Generate amplification ~1-2×; the conf exists so an
  * analyst's plain `BETWEEN` join gets the scale-safe plan without
  * rewriting their query. `binSize` units follow the column's integral
  * image: int/long columns band in their native units, DATE columns in
  * DAYS (`unix_date`), TIMESTAMP columns in MICROSECONDS
  * (`unix_micros`) — a raw Cast would return NULL for dates and
  * seconds for timestamps in Spark 4, so the conversions are explicit.
  * Degenerate intervals (lo > hi — dirty data the plain join silently
  * no-matches) band to an empty bucket array instead of tripping
  * Sequence's illegal-boundaries error.
  */
case class BandedRangeJoin() extends Rule[LogicalPlan] with PredicateHelper {

  private val ConfKey = "spark.graft.rangeJoin.binSize"

  private def bandable(e: Expression): Boolean = e.dataType match {
    case IntegerType | LongType | DateType | TimestampType => true
    case _ => false
  }

  /** Monotonic conversion to a long the floor-div can band on. A raw
    * Cast is NOT safe here: Cast(date, long) evaluates to NULL in
    * Spark 4 (castToLong has no DateType branch) and Cast(ts, long)
    * yields epoch SECONDS, not the micros the binSize contract names —
    * so dates go through UnixDate (days since epoch) and timestamps
    * through UnixMicros. */
  private def toLong(x: Expression): Expression = x.dataType match {
    case LongType => x
    case DateType => Cast(UnixDate(x), LongType)
    case TimestampType => UnixMicros(x)
    case _ => Cast(x, LongType)
  }

  /** Exact floor division after the monotonic conversion. Constructed
    * post-analysis, so the analyzer won't revisit these expressions. */
  private def floorDiv(x: Expression, w: Long): Expression = {
    val xl = toLong(x)
    val width = Literal(w, LongType)
    IntegralDivide(Subtract(xl, Pmod(xl, width)), width)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(ConfKey, "0").toLong
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        def fromOnly(p: LogicalPlan)(e: Expression): Boolean =
          e.references.nonEmpty && e.references.subsetOf(p.outputSet)
        val crossEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (fromOnly(l)(a) && fromOnly(r)(b)) || (fromOnly(r)(a) && fromOnly(l)(b))
          case EqualNullSafe(a, b) =>
            (fromOnly(l)(a) && fromOnly(r)(b)) || (fromOnly(r)(a) && fromOnly(l)(b))
          case _ => false
        }
        if (crossEqui) j
        else {
          // normalize every comparison to (point-candidate, bound, isLower)
          val lowers = conjuncts.collect {
            case GreaterThanOrEqual(p, lo) => (p, lo)
            case GreaterThan(p, lo) => (p, lo)
            case LessThanOrEqual(lo, p) => (p, lo)
            case LessThan(lo, p) => (p, lo)
          }
          val uppers = conjuncts.collect {
            case LessThanOrEqual(p, hi) => (p, hi)
            case LessThan(p, hi) => (p, hi)
            case GreaterThanOrEqual(hi, p) => (p, hi)
            case GreaterThan(hi, p) => (p, hi)
          }
          // the point and both bounds must come from OPPOSITE sides
          val match_ = (for {
            (p1, lo) <- lowers
            (p2, hi) <- uppers
            if p1.semanticEquals(p2) && bandable(p1) && bandable(lo) && bandable(hi)
            sides <- Seq((l, r), (r, l)).find { case (ps, is) =>
              fromOnly(ps)(p1) && fromOnly(is)(lo) && fromOnly(is)(hi)
            }
          } yield (p1, lo, hi, sides._1, sides._2)).headOption

          match_ match {
            case None => j
            case Some((p, lo, hi, pointSide, intervalSide)) =>
              val bucket = AttributeReference("__graft_range_bucket", LongType,
                nullable = false)()
              val (fdLo, fdHi) = (floorDiv(lo, w), floorDiv(hi, w))
              val seq = Sequence(fdLo, fdHi,
                Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
              // Reversed/empty intervals (lo > hi) must explode to zero
              // rows like the un-rewritten join's silent no-match, not
              // throw Sequence's illegal-boundaries error. A NULL bound
              // makes the predicate null -> the If's false branch -> the
              // same empty array.
              val guarded = If(LessThanOrEqual(fdLo, fdHi), seq,
                Literal.create(Array.empty[Long],
                  ArrayType(LongType, containsNull = false)))
              val banded = Generate(Explode(guarded), unrequiredChildIndex = Nil,
                outer = false, qualifier = None, generatorOutput = Seq(bucket),
                child = intervalSide)
              val newCond = And(EqualTo(floorDiv(p, w), bucket), cond)
              // Join child order must be preserved (downstream rules and
              // the spec's plan asserts read left/right); only the
              // interval side gains the Generate.
              if (intervalSide eq r) Join(pointSide, banded, Inner, Some(newCond), hint)
              else Join(banded, pointSide, Inner, Some(newCond), hint)
          }
        }
    }
  }
}
