package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the declarative row gate a managed
  * pipeline runs at every commit (the Delta-Live-Tables shape): named
  * predicates split a frame into clean rows and quarantined rows, with
  * each quarantined row carrying the list of rules it failed, so the
  * violation report is per-rule and the bad rows stay inspectable
  * instead of vanishing into a filter.
  *
  * Semantics are FAIL-CLOSED: a predicate evaluating to NULL counts as
  * a violation (unlike SQL CHECK, which passes NULL) — at a data gate,
  * "can't tell" must not mean "fine". One codegen'd projection
  * evaluates every rule per row; no rule is a separate pass.
  *
  * Scale shape: a pure projection + filter riding the scan — the split
  * adds zero shuffles; violation counts are one exploded aggregation
  * over the (usually tiny) quarantine side. Composes with
  * [[VersionedTable]]: commit the clean side, keep the quarantine as
  * its own table for triage (q80).
  */
object Expectations {

  /** Split `df` by `rules` (name → predicate that clean rows satisfy).
    * Returns (clean, quarantined); quarantined rows carry a `violated`
    * array of the failed rule names (never empty). */
  def split(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "expectations need at least one rule")
    require(!df.columns.contains("violated"),
      "expectations: input already has a 'violated' column — the split " +
        "would silently overwrite it (rename it before gating)")
    val names = rules.map(_._1)
    require(names.distinct.size == names.size, s"duplicate rule names in $names")
    val failed = array(rules.map { case (n, p) =>
      when(!coalesce(p, lit(false)), lit(n))
    }: _*)
    val tagged = df.withColumn("violated", filter(failed, x => x.isNotNull))
    (tagged.filter(size(col("violated")) === 0).drop("violated"),
      tagged.filter(size(col("violated")) > 0))
  }

  /** Per-rule violation counts from a [[split]] quarantine side —
    * a row failing two rules counts once under each. */
  def violationCounts(quarantined: DataFrame): DataFrame =
    quarantined.select(explode(col("violated")).as("rule"))
      .groupBy("rule").agg(count(lit(1)).as("n"))
}
