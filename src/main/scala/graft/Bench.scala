package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failures are reported per-query ("err") and make
  * the process exit nonzero — a round where queries crash must never look
  * like a (fast) successful bench.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, parquet footer caches, scheduler) on a
    // trivial scan so the first timed query doesn't absorb JVM startup.
    try spark.read.parquet(s"$sfDir/nation.parquet").count()
    catch { case _: Throwable => () }
    // Untimed per-query warm-up pass over the SAME data directory: each
    // query's first execution pays its own whole-stage-codegen + JIT
    // compile (~0.5-2 s on the expression-heavy ones), which measures the
    // compiler, not the engine. Warming on the timed directory itself (not
    // a smaller SF) guarantees the compiled plans are identical — join
    // strategies and AQE stage shapes depend on input sizes, so a
    // small-scale warm-up could compile different codegen than the timed
    // pass executes. Warm-up failures are ignored; the timed pass still
    // surfaces them as "err".
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    var failures = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        // noop sink, not count(): count() lets Catalyst prune every unused
        // column, so projection-only queries would be timed at ~zero cost.
        // The noop DSv2 writer consumes every row in full.
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failures ::= name; false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec.toString else "\"err\"")
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if !v.startsWith("\"") => v.toDouble }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":${failures.size}}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
