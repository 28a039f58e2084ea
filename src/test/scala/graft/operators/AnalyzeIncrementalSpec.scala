package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental ANALYZE: per-(partition, store version) HLL sketch
  * sidecars make re-ANALYZE cost track the INCREMENT — after a
  * one-partition merge only that partition is rescanned (asserted via
  * the scan's own inputFiles), the rest unions from sidecar bytes, and
  * the resulting stats equal a full re-analyze (exact for rows/nulls/
  * min/max/lengths, HLL tolerance for NDV). */
class AnalyzeIncrementalSpec extends SparkSpec {

  private def freshStore(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def table(n: Int) = spark.range(n).select(
    col("id").as("k"),
    concat(lit("p"), (col("id") % 4).cast("string")).as("part"),
    (col("id") % 97).as("v"),
    concat(lit("name_"), (col("id") % 53).cast("string")).as("nm"))

  private def assertClose(
      inc: Map[String, String], full: Map[String, String]): Unit = {
    // exact keys: rows, nulls, min/max, lengths
    val exact = full.keys.filter(k => k == "stats.rows" ||
      k.endsWith(".nulls") || k.endsWith(".min") || k.endsWith(".max") ||
      k.endsWith(".maxlen"))
    exact.foreach { k =>
      assert(inc.get(k).isDefined, s"incremental analyze missing $k")
      if (k.endsWith(".min") || k.endsWith(".max"))
        assert(BigDecimal(inc(k)) === BigDecimal(full(k)),
          s"$k: ${inc(k)} vs ${full(k)}")
      else assert(inc(k) === full(k), s"$k: ${inc(k)} vs ${full(k)}")
    }
    // NDV within HLL tolerance (two different HLL implementations)
    full.keys.filter(_.endsWith(".ndv")).foreach { k =>
      val (a, b) = (inc(k).toDouble, full(k).toDouble)
      assert(math.abs(a - b) / math.max(b, 1.0) < 0.1,
        s"$k out of HLL tolerance: inc=$a full=$b")
    }
  }

  test("first incremental analyze scans everything once; a re-run scans NOTHING; stats match full analyze") {
    val dir = freshStore("graftai")
    PartitionedTable.commit(spark, dir, table(1000), "part")
    val full = PartitionedTable.analyzeTable(spark, dir)
    val inc = PartitionedTable.analyzeTableIncremental(spark, dir, "part")
    assert(inc("analyze.scanned_partitions") === "4",
      "first incremental analyze builds every partition's sidecar")
    assertClose(inc, full)
    assert(inc("stats.mode") === "incremental")
    // unchanged table, sidecars in place: ZERO scan
    val again = PartitionedTable.analyzeTableIncremental(spark, dir, "part")
    assert(again("analyze.scanned_partitions") === "0" &&
      again("analyze.scanned_files") === "0",
      "an unchanged table re-analyzes from sidecar bytes alone")
    assertClose(again, full)
  }

  test("after a one-partition merge, re-analyze scans ONLY that partition (inputFiles-asserted) and equals a full re-analyze") {
    import spark.implicits._
    val dir = freshStore("graftaim")
    PartitionedTable.commit(spark, dir, table(1000), "part")
    PartitionedTable.analyzeTableIncremental(spark, dir, "part"): Unit
    // merge touches ONLY p2 (new rows + a value shift)
    PartitionedTable.merge(spark, dir,
      Seq((5000L, "p2", 7L, "zzz_new", "upsert"),
        (2L, "p2", 96L, "name_2", "upsert"))
        .toDF("k", "part", "v", "nm", "op"),
      "k", "part")
    val inc = PartitionedTable.analyzeTableIncremental(spark, dir, "part")
    assert(inc("analyze.scanned_partitions") === "1",
      s"only the merged partition rescans: $inc")
    // the scan's inputFiles = exactly p2's current files, nothing else
    val p2Files = PartitionedTable
      .readPartitions(spark, dir, Seq("p2")).inputFiles.length
    val allFiles = PartitionedTable.read(spark, dir).inputFiles.length
    assert(inc("analyze.scanned_files").toInt === p2Files,
      s"scan cost must be the merged partition's files: " +
        s"${inc("analyze.scanned_files")} vs p2=$p2Files (table=$allFiles)")
    assert(p2Files < allFiles, "sanity: p2 is a strict subset")
    // ...and the unioned stats equal a from-scratch full analyze
    val full = PartitionedTable.analyzeTable(spark, dir)
    // (full analyze replaced stats.*; re-run incremental for compare)
    val inc2 = PartitionedTable.analyzeTableIncremental(spark, dir, "part")
    assert(inc2("analyze.scanned_partitions") === "0")
    assertClose(inc2, full)
    // the new row's extremes surfaced through the union
    assert(inc2("stats.col.k.max") === "5000")
    assert(inc2("stats.col.nm.maxlen") === full("stats.col.nm.maxlen"))
  }

  test("vacuum GCs sidecars of pruned store versions; the next analyze rebuilds only those") {
    import spark.implicits._
    val dir = freshStore("graftaigc")
    PartitionedTable.commit(spark, dir, table(400), "part")
    PartitionedTable.analyzeTableIncremental(spark, dir, "part"): Unit
    PartitionedTable.merge(spark, dir,
      Seq((9000L, "p1", 1L, "x", "upsert")).toDF("k", "part", "v", "nm", "op"),
      "k", "part") // v1: p1 gets a new store version
    PartitionedTable.vacuum(spark, dir, keep = 1) // drops v0; p1's old store
    val inc = PartitionedTable.analyzeTableIncremental(spark, dir, "part")
    assert(inc("analyze.scanned_partitions") === "1",
      "only the re-versioned partition needs a new sidecar after vacuum")
    assert(inc("stats.rows") === "401")
  }

  test("multi-level tables analyze incrementally through the derived composite column") {
    import spark.implicits._
    val dir = freshStore("graftaiml")
    val rows = spark.range(400).select(
      col("id").as("k"),
      concat(lit("S"), (col("id") % 2).cast("string")).as("st"),
      to_date(concat(lit("1996-0"), ((floor(col("id") / 2) % 4) + 1)
        .cast("string"), lit("-15"))).as("d"),
      (col("id") * 10).as("v"))
    PartitionedTable.commitLevels(spark, dir, rows, Seq(
      PartitionedTable.GenLevel("st", PartitionedTable.PartGen.Prefix(2), "ps"),
      PartitionedTable.GenLevel("d", PartitionedTable.PartGen.Month, "pm")))
    // the engine writes the derived composite into the data — the
    // incremental grouping key for a levels table
    val first = PartitionedTable.analyzeTableIncremental(
      spark, dir, PartitionedTable.LevelsPartName)
    assert(first("stats.rows") === "400")
    assert(first("analyze.scanned_partitions").toInt === 8,
      s"2 statuses x 4 months: $first")
    // merge one (status, month) combination; only IT rescans
    PartitionedTable.mergeLevels(spark, dir,
      Seq((9001L, "S1", java.sql.Date.valueOf("1996-02-15"), 5L, "upsert"))
        .toDF("k", "st", "d", "v", "op"), "k")
    val inc = PartitionedTable.analyzeTableIncremental(
      spark, dir, PartitionedTable.LevelsPartName)
    assert(inc("analyze.scanned_partitions") === "1",
      s"one touched combination rescans: $inc")
    assert(inc("stats.rows") === "401")
    assert(inc("stats.col.k.max") === "9001")
  }

  test("the SQL front door: CALL analyze(incremental => true) reports scanned partitions") {
    val dir = freshStore("graftaisql")
    PartitionedTable.commit(spark, dir, table(200), "part")
    graft.sources.GraftCatalog.register(spark, "ainc", "t", dir,
      partCol = Some("part"))
    val row = spark.sql(
      "CALL graft.system.analyze(table => 'ainc.t', incremental => true)")
      .collect().head
    assert(row.getLong(1) === 200L, "n_rows")
    assert(row.getInt(4) === 4, "scanned_partitions on first run")
    val row2 = spark.sql(
      "CALL graft.system.analyze(table => 'ainc.t', incremental => true)")
      .collect().head
    assert(row2.getInt(4) === 0, "second run unions sidecars only")
    // histograms are a full-analyze feature: fail loud, not silent
    val e = intercept[Exception](spark.sql(
      "CALL graft.system.analyze(table => 'ainc.t', incremental => true, " +
        "histogram_columns => 'v')").collect())
    assert(e.getMessage.contains("full-analyze"), e.getMessage)
    graft.sources.GraftCatalog.unregister("ainc", "t")
  }
}
