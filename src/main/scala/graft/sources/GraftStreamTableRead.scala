package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.execution.datasources.DataSource
import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation

/** `spark.readStream.table("graft.db.t")` — the read leg symmetric to
  * round 14's `writeStream.toTable` sink, bound by IDENTIFIER instead
  * of `format("graft-cdf").option("dir", ...)`:
  *
  * {{{
  *   spark.readStream.table("graft.db.t")          // the change feed
  *     .writeStream.toTable("graft.db.replica")    // the r14 sink
  * }}}
  *
  * The stream IS the table's change data feed (the Delta
  * `readChangeFeed` semantic; its schema is the table's columns PLUS
  * `op` and `_commit_version`, so any projection a table reader writes
  * still resolves). Options pass through verbatim —
  * `maxversionsperbatch`, `startversion`, `preimages` keep their
  * `graft-cdf` meaning — and the engine's exactly-once offset-log
  * machinery, admission control, and vacuum-horizon guard are ALL the
  * V1 source's own, because this is a RESOLUTION-TIME rewrite onto
  * that battle-tested source, not a re-implementation: the analyzer
  * turns the table's [[StreamingRelationV2]] into the `graft-cdf`
  * [[StreamingRelation]] (Spark's own modeled V1 fallback seam), with
  * a projection preserving the V2 node's attribute ids so references
  * already resolved against the table's columns stay bound.
  *
  * Installed via [[graft.plans.GraftExtensions]]
  * (`injectResolutionRule`); sessions built without extensions keep
  * the explicit `format("graft-cdf")` spelling. */
case class GraftStreamTableRead(spark: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case s @ StreamingRelationV2(_, _, t: GraftTable, options, _, _, _, _) =>
        import scala.jdk.CollectionConverters._
        val spec = t.tableSpec
        val key = spec.keyCol.getOrElse(throw new IllegalArgumentException(
          s"graft catalog: readStream.table(${t.name()}) needs the table " +
            "registered with its key column (register(..., keyCol = " +
            "Some(...))) — the change feed diffs commits by (partition, key)"))
        val part = spec.partCol.getOrElse(throw new IllegalArgumentException(
          s"graft catalog: readStream.table(${t.name()}) needs the table " +
            "registered with its partition column"))
        val params = options.asScala.toMap ++
          Map("dir" -> spec.dir, "key" -> key, "part" -> part)
        val feedSchema = GraftCdfSource.feedSchema(spark, params)
        val attrs = feedSchema.fields.toSeq.map(f =>
          AttributeReference(f.name, f.dataType, f.nullable, f.metadata)())
        val rel = StreamingRelation(
          DataSource(spark, className = "graft-cdf", options = params),
          "graft-cdf", attrs)
        // keep the V2 node's exprIds for same-named columns: upstream
        // operators may have resolved against the TABLE's attributes
        // in an earlier fixpoint iteration
        val old = s.output.map(a => a.name -> a).toMap
        val proj: Seq[NamedExpression] = attrs.map { a =>
          old.get(a.name) match {
            case Some(o) => Alias(a, a.name)(exprId = o.exprId)
            case None => a
          }
        }
        Project(proj, rel)
    }
}
