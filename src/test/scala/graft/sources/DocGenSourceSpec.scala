package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class DocGenSourceSpec extends SparkSpec {

  private def read(rows: Long = 1000L, splits: Int = 8): DataFrame =
    spark.read.format("graft-docs")
      .option("rows", rows.toString).option("splits", splits.toString).load()

  private def scanOf(df: DataFrame): DocGenScan = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    } ++ df.queryExecution.executedPlan.collect {
      // under AQE the scan hides inside the adaptive plan
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case b: BatchScanExec => b.scan }
    }.flatten
    scans.collectFirst { case s: DocGenScan => s }.get
  }

  test("generates a deterministic corpus with the declared schema") {
    val df = read(rows = 500)
    assert(df.schema.fieldNames.toSeq ===
      Seq("doc_id", "lang", "source", "n_chars", "text"))
    assert(df.count() === 500)
    // deterministic: two independent reads agree row-for-row
    val a = df.orderBy("doc_id").collect()
    val b = read(rows = 500).orderBy("doc_id").collect()
    assert(a === b)
    // and text length really is n_chars
    assert(df.filter(length(col("text")) =!= col("n_chars")).count() === 0)
  }

  test("doc_id range predicates clip split planning — fewer tasks, not just fewer rows") {
    val full = read(rows = 1000, splits = 8)
    assert(scanOf(full).planInputPartitions().length === 8)

    val clipped = read(rows = 1000, splits = 8)
      .filter(col("doc_id") >= 750 && col("doc_id") < 1000)
    val scan = scanOf(clipped)
    assert(scan.lo === 750L && scan.hi === 1000L)
    // 25% of the interval → a quarter of the splits get planned
    assert(scan.planInputPartitions().length === 2)
    assert(clipped.count() === 250)

    // the pushed range is fully consumed: results still correct
    val ids = clipped.agg(min("doc_id"), max("doc_id")).head()
    assert(ids.getLong(0) === 750L && ids.getLong(1) === 999L)

    // an unsupported filter (lang) is NOT claimed: Spark re-applies it
    val mixed = read(rows = 1000)
      .filter(col("doc_id") < 100 && col("lang") === "en")
    assert(scanOf(mixed).hi === 100L)
    val langs = mixed.select("lang").distinct().collect().map(_.getString(0)).toSeq
    assert(langs === Seq("en"))
  }

  test("column pruning reaches the generator") {
    val pruned = read(rows = 200).select("doc_id", "lang")
    assert(scanOf(pruned).readSchema().fieldNames.toSeq === Seq("doc_id", "lang"))
    assert(pruned.distinct().count() > 0)
  }

  test("options are case-insensitive; Long-extreme predicates don't wrap") {
    assert(spark.read.format("graft-docs").option("Rows", "300").load().count() === 300)
    // tautology keeps everything, contradiction keeps nothing — the
    // saturating bound math must not overflow at Long.MaxValue
    assert(read(100).filter(col("doc_id") <= Long.MaxValue).count() === 100)
    assert(read(100).filter(col("doc_id") > Long.MaxValue).count() === 0)
    assert(read(100).filter(col("doc_id") === Long.MaxValue).count() === 0)
  }

  test("columnar and row readers produce identical results; columnar is the scan mode") {
    // 9000-row splits = 3 ColumnarBatches each (BatchRows = 4096): the
    // refill path — vector reset between batches — is actually exercised
    val columnar = read(rows = 27000, splits = 3)
    val rowMode = spark.read.format("graft-docs")
      .option("rows", "27000").option("splits", "3").option("columnar", "false").load()
    assert(columnar.orderBy("doc_id").collect() === rowMode.orderBy("doc_id").collect())

    // the columnar scan really enters the plan as batches: Spark inserts
    // a ColumnarToRow above it, absent in row mode
    def hasColumnarToRow(df: DataFrame): Boolean = {
      df.collect() // materialize so AQE finalizes the plan
      df.queryExecution.executedPlan.toString.contains("ColumnarToRow")
    }
    assert(hasColumnarToRow(columnar.select(sum("n_chars"))))
    assert(!hasColumnarToRow(rowMode.select(sum("n_chars"))))
  }

  test("micro-batch stream: rate-limited offsets, exactly-once resume from checkpoint") {
    val root = java.nio.file.Files.createTempDirectory("graft-docgen-stream").toString
    def drain(rows: Long): Unit = {
      val q = spark.readStream.format("graft-docs")
        .option("rows", rows.toString).option("ratePerBatch", "300").load()
        .select("doc_id", "lang")
        .writeStream.format("parquet")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
        .start()
      try { q.processAllAvailable() } finally q.stop()
    }
    drain(1000)
    val first = spark.read.parquet(s"$root/out")
    assert(first.count() === 1000)
    assert(first.select("doc_id").distinct().count() === 1000)
    // rate limiting really split the work: ≥4 offset log entries (300×3+100)
    assert(new java.io.File(s"$root/ckpt/offsets").list().count(!_.startsWith(".")) >= 4)

    // restart with MORE data available, same checkpoint: resumes at 1000
    // and appends exactly the delta — no replay, no gap
    drain(1500)
    val second = spark.read.parquet(s"$root/out")
    assert(second.count() === 1500)
    assert(second.select("doc_id").distinct().count() === 1500)
  }

  test("Trigger.AvailableNow drains EVERYTHING despite the rate limit") {
    // the engine passes ReadAllAvailable here — a source that ignores the
    // ReadLimit would deliver one 300-row quantum and stop "successfully"
    val root = java.nio.file.Files.createTempDirectory("graft-docgen-avail").toString
    val q = spark.readStream.format("graft-docs")
      .option("rows", "1000").option("ratePerBatch", "300").load()
      .select("doc_id")
      .writeStream.format("parquet")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.read.parquet(s"$root/out").count() === 1000)
  }

  test("empty clip plans zero partitions") {
    val none = read(rows = 100).filter(col("doc_id") >= 500)
    assert(scanOf(none).planInputPartitions().length === 0)
    assert(none.count() === 0)
  }
}
