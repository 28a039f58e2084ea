package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Scale posture (SURVEY §7.7): AQE on (runtime coalesce + skew-join +
  * broadcast conversion), shuffle partitions sized for the local harness
  * (a real cluster would set this to ~2-3x total cores or rely on AQE),
  * ANSI off for reference-parity semantics (the reference is Spark 2.4:
  * `cast('abc' as int)` yields null, `element_at` out-of-bounds yields
  * null — SURVEY §7.4 risk 2).
  */
object Sessions {
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Post-pushdown rules — extensions hooks all run too early for them
    graft.plans.GraftScanStats.ensureInstalled(spark)
    graft.plans.GraftRuntimePrune.ensureInstalled(spark)
    spark
  }

  /** Apply graft runtime confs to an externally-built session (Verify/Bench
    * build their own to honor the driver contract). This is also where the
    * as-of planner strategy lands on sessions built without
    * [[graft.plans.GraftExtensions]] — session setup, not the query path. */
  def tune(spark: SparkSession): SparkSession = {
    graft.plans.AsOf.ensureInstalled(spark)
    // Same post-hoc installation for the banded range-join optimizer
    // rule on sessions built without GraftExtensions (driver contract).
    // Idempotent; the rule itself is a no-op until its conf is set.
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[graft.plans.BandedRangeJoin]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BandedRangeJoin()
    // Manifest-derived scan statistics for the SQL catalog's V1-bridged
    // scans (auto-broadcast of small graft tables; see GraftScanStats),
    // and runtime (join-driven) manifest partition pruning.
    graft.plans.GraftScanStats.ensureInstalled(spark)
    graft.plans.GraftRuntimePrune.ensureInstalled(spark)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // The events fixture carries INT64 TIMESTAMP(NANOS) which Spark 4
    // refuses by default (PARQUET_TYPE_ILLEGAL); read nanos as long and
    // convert in Tables.events (micros, matching the DuckDB oracle).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Range-join banding is opt-in PER QUERY (q73 sets it while building
    // its plan); reset here so one query's choice can't leak into the
    // next query's optimizer run on the shared driver session.
    spark.conf.unset("spark.graft.rangeJoin.binSize")
    spark
  }
}
