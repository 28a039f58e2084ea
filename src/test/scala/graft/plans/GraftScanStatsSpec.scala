package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.PartitionedTable
import graft.sources.{GraftCatalog, GraftRelation, GraftScan}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.RowDataSourceScanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** Manifest-derived statistics for the SQL catalog path: a small graft
  * dimension must auto-broadcast in a SQL join with NO hint — the
  * plan a hand-tuned star query would use — and the estimate must
  * shrink with partition pruning. The V1 bridge otherwise reports
  * defaultSizeInBytes (never broadcast); [[GraftScanStats]] re-wraps
  * the V1ScanWrapper so [[GraftScan.estimateStatistics]] reaches the
  * planner. */
class GraftScanStatsSpec extends SparkSpec {

  private def freshStore(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def table(n: Int) = spark.range(n).select(
    col("id").as("k"),
    concat(lit("p"), (col("id") % 4).cast("string")).as("part"),
    (col("id") * 10).as("v"))

  private def scanOf(df: DataFrame): GraftScan =
    df.queryExecution.executedPlan.collectFirst {
      case r: RowDataSourceScanExec => r.relation
    }.collect { case g: GraftRelation => g.scan }
      .getOrElse(fail("no GraftRelation in the plan"))

  test("estimateBytes: live-slice sums, pruned subsets, unknown past maxSlices") {
    val dir = freshStore("graftstats")
    PartitionedTable.commit(spark, dir, table(1000), "part") // v0, 4 parts
    val full = PartitionedTable.estimateBytes(spark, dir).get
    assert(full > 0L)
    val one = PartitionedTable.estimateBytes(
      spark, dir, partitions = Some(Seq("p0"))).get
    assert(one > 0L && one < full)
    val two = PartitionedTable.estimateBytes(
      spark, dir, partitions = Some(Seq("p0", "p1"))).get
    assert(two > one && two < full)
    // absent partition contributes nothing
    assert(PartitionedTable.estimateBytes(
      spark, dir, partitions = Some(Seq("nope"))).get === 0L)
    // wider than maxSlices -> unknown (caller falls back to default)
    assert(PartitionedTable.estimateBytes(spark, dir, maxSlices = 3).isEmpty)
    // immutable-slice cache: same answer on the cached second call
    assert(PartitionedTable.estimateBytes(spark, dir).get === full)

    // a merge-on-read delta counts its base chain (never underestimates):
    // a delete-only batch always lands as a DV (no amortization floor)
    import spark.implicits._
    val v0p0 = one
    PartitionedTable.merge(spark, dir,
      Seq((1L, "p0", 0L, "delete")).toDF("k", "part", "v", "op"),
      "k", "part")
    val p0AfterDelta = PartitionedTable.estimateBytes(
      spark, dir, partitions = Some(Seq("p0"))).get
    assert(p0AfterDelta >= v0p0,
      s"DV delta slice must include its base: $p0AfterDelta < $v0p0")
    // time travel sizes the PINNED version, not latest
    assert(PartitionedTable.estimateBytes(spark, dir, Some(0L)).get === full)
  }

  test("SQL scan reports pruning-scaled statistics; small dims auto-broadcast with no hint") {
    GraftScanStats.ensureInstalled(spark)
    val factDir = freshStore("graftstatsf")
    val dimDir = freshStore("graftstatsd")
    PartitionedTable.commit(spark, factDir, table(20000), "part")
    PartitionedTable.commit(spark, dimDir,
      table(40).select(col("k"), col("part"),
        concat(lit("name"), col("k")).as("nm")), "part")
    GraftCatalog.register(spark, "stats", "fact", factDir, partCol = Some("part"))
    GraftCatalog.register(spark, "stats", "dim", dimDir, partCol = Some("part"))

    // the scan's own estimate: present, and pruned < full
    val fullScan = scanOf(spark.sql("SELECT * FROM graft.stats.fact"))
    val pruned = scanOf(
      spark.sql("SELECT * FROM graft.stats.fact WHERE part = 'p0'"))
    val fullSz = fullScan.estimateStatistics().sizeInBytes()
    val prunedSz = pruned.estimateStatistics().sizeInBytes()
    assert(fullSz.isPresent && prunedSz.isPresent)
    assert(prunedSz.getAsLong < fullSz.getAsLong)

    val joinSql =
      """SELECT f.k, f.v, d.nm
        |FROM graft.stats.fact f JOIN graft.stats.dim d ON f.k = d.k""".stripMargin
    // AQE off for the A/B: we are asserting the PLAN-TIME decision
    // (AQE could rescue the join at runtime and mask a missing estimate)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joins = spark.sql(joinSql).queryExecution.executedPlan.collect {
        case b: BroadcastHashJoinExec => b
      }
      assert(joins.nonEmpty,
        "40-row graft dim must auto-broadcast from manifest stats, no hint")
      // sanity: the broadcast came from the ESTIMATE, not from some
      // always-broadcast default — with the threshold off it sort-merges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val smj = spark.sql(joinSql).queryExecution.executedPlan.collect {
        case s: SortMergeJoinExec => s
      }
      assert(smj.nonEmpty, "threshold -1 must fall back to sort-merge")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    // results identical either way (statistics may never change rows)
    val viaSql = spark.sql(joinSql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(viaSql.length === 40)
    assert(viaSql.take(2).map(_._1).toSeq === Seq(0L, 1L))
  }

  test("estimateRows: exact footer math incl. MoR deltas, pruned subsets, unknown past maxSlices") {
    import spark.implicits._
    val dir = freshStore("graftrows")
    PartitionedTable.commit(spark, dir, table(1000), "part") // 250/partition
    assert(PartitionedTable.estimateRows(spark, dir).get === 1000L)
    assert(PartitionedTable.estimateRows(
      spark, dir, partitions = Some(Seq("p0"))).get === 250L)
    assert(PartitionedTable.estimateRows(
      spark, dir, partitions = Some(Seq("nope"))).get === 0L)
    assert(PartitionedTable.estimateRows(spark, dir, maxSlices = 3).isEmpty)
    // MoR delta: a delete lands a DV — live rows drop by exactly one
    PartitionedTable.merge(spark, dir,
      Seq((4L, "p0", 0L, "delete")).toDF("k", "part", "v", "op"),
      "k", "part") // v1
    assert(PartitionedTable.estimateRows(spark, dir).get === 999L,
      "DV tombstones must subtract from the slice's footer count")
    // time travel counts the PINNED version
    assert(PartitionedTable.estimateRows(spark, dir, Some(0L)).get === 1000L)
  }

  test("rows-only statistics still unlock auto-broadcast (bytes unknown), and CBO consumes the row counts") {
    GraftScanStats.ensureInstalled(spark)
    val factDir = freshStore("graftrowsf")
    val dimDir = freshStore("graftrowsd")
    PartitionedTable.commit(spark, factDir, table(20000), "part")
    PartitionedTable.commit(spark, dimDir,
      table(40).select(col("k"), col("part"),
        concat(lit("name"), col("k")).as("nm")), "part")
    GraftCatalog.register(spark, "rstats", "fact", factDir,
      partCol = Some("part"))
    GraftCatalog.register(spark, "rstats", "dim", dimDir,
      partCol = Some("part"))

    // the scan reports exact row counts, pruned along with the manifest
    val fullScan = scanOf(spark.sql("SELECT * FROM graft.rstats.fact"))
    assert(fullScan.estimateStatistics().numRows().getAsLong === 20000L)
    val pruned = scanOf(
      spark.sql("SELECT * FROM graft.rstats.fact WHERE part = 'p0'"))
    assert(pruned.estimateStatistics().numRows().getAsLong === 5000L)

    val joinSql =
      """SELECT f.k, f.v, d.nm
        |FROM graft.rstats.fact f JOIN graft.rstats.dim d ON f.k = d.k""".stripMargin
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // A/B: byte estimation disabled (cap 0 → every table too wide) —
    // the planner must still auto-broadcast the 40-row dim, deriving
    // sizeInBytes from numRows × schema width (transformV2Stats)
    spark.conf.set("spark.graft.stats.maxSlicesBytes", "0")
    try {
      val scan = scanOf(spark.sql("SELECT * FROM graft.rstats.dim"))
      assert(scan.estimateStatistics().numRows().getAsLong === 40L)
      // with the listing-based byte estimate capped out, sizeInBytes
      // derives from rows × schema width — tiny, so the dim broadcasts
      val derived = scan.estimateStatistics().sizeInBytes()
      assert(derived.isPresent && derived.getAsLong < 10000L,
        s"rows-derived size must be schema-width-scaled: $derived")
      val joins = spark.sql(joinSql).queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(joins.nonEmpty,
        "a rows-only estimate must still auto-broadcast the small dim")
      // CBO consumes the counts: the optimized JOIN's estimated row
      // count exists (JoinEstimation needs rowCount on BOTH sides)
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val joinStats = spark.sql(joinSql).queryExecution.optimizedPlan.stats
      assert(joinStats.rowCount.isDefined,
        s"CBO join estimation must see the scans' row counts: $joinStats")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.graft.stats.maxSlicesBytes")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    // rows unchanged by any of it
    assert(spark.sql(joinSql).count() === 40L)
  }

  test("ANALYZE persists column statistics; the scan serves them to the planner as catalyst ColumnStat") {
    GraftScanStats.ensureInstalled(spark)
    val dir = freshStore("graftcolstats")
    PartitionedTable.commit(spark, dir, table(1000), "part")
    GraftCatalog.register(spark, "cstats", "t", dir, partCol = Some("part"))
    val stats = PartitionedTable.analyzeTable(spark, dir)
    assert(stats("stats.rows") === "1000")
    assert(stats.contains("stats.col.k.ndv") &&
      stats("stats.col.k.min") === "0" && stats("stats.col.k.max") === "999")
    assert(stats.contains("stats.col.part.avglen"),
      "string columns carry length stats instead of min/max")
    // DESCRIBE EXTENDED surfaces them (the properties merge)
    val described = spark.sql("DESCRIBE TABLE EXTENDED graft.cstats.t")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(described.contains("stats.col.k.ndv"), described)

    // the scan serves them as V2 column stats...
    val scan = scanOf(spark.sql("SELECT k, v FROM graft.cstats.t"))
    val cs = scan.estimateStatistics().columnStats()
    assert(!cs.isEmpty, "required columns with stats must serve ColumnStatistics")
    val kStat = cs.entrySet().iterator().next()
    assert(cs.size() === 2, s"k and v both analyzed: $cs")
    val _ = kStat
    // ...and CBO turns them into catalyst attributeStats on the relation
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val rel = spark.sql("SELECT k, v FROM graft.cstats.t")
        .queryExecution.optimizedPlan.collectFirst {
          case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => r
        }.getOrElse(fail("no V2 scan relation"))
      val attrStats = rel.stats.attributeStats
      assert(attrStats.nonEmpty, "transformV2Stats must map columnStats")
      val k = attrStats.toSeq.find(_._1.name == "k").map(_._2)
        .getOrElse(fail(s"no ColumnStat for k: $attrStats"))
      assert(k.distinctCount.exists(_.toLong > 900L),
        s"HLL NDV of 1000 distinct keys: ${k.distinctCount}")
      assert(k.min.contains(0L) && k.max.contains(999L),
        s"min/max as catalyst values: ${k.min}/${k.max}")
      // the A/B gate: colStats off → the same scan serves nothing
      spark.conf.set("spark.graft.stats.colStats", "false")
      val off = scanOf(spark.sql("SELECT k, v FROM graft.cstats.t"))
      assert(off.estimateStatistics().columnStats().isEmpty)
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.graft.stats.colStats")
    }
    GraftCatalog.unregister("cstats", "t")
  }

  test("negative control: CBO join REORDER changes the join tree with column stats on vs off; rows identical") {
    GraftScanStats.ensureInstalled(spark)
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}
    // fact(20k): kb spans 2000 values, kc spans 1000; dim b(2000) on kb,
    // dim c(10) on kc → F⋈C is ~200 rows, F⋈B ~20k. Written F⋈B⋈C, a
    // cost-based reorder must join the selective C first — and that
    // decision needs the keys' NDVs, i.e. the ANALYZE column stats.
    val fDir = freshStore("graftcbof")
    val bDir = freshStore("graftcbob")
    val cDir = freshStore("graftcboc")
    PartitionedTable.commit(spark, fDir, spark.range(20000).select(
      col("id").as("k"),
      concat(lit("p"), (col("id") % 4).cast("string")).as("part"),
      (col("id") % 2000).as("kb"), (col("id") % 1000).as("kc")), "part")
    PartitionedTable.commit(spark, bDir, spark.range(2000).select(
      col("id").as("kb"), lit("all").as("part"),
      concat(lit("b"), col("id")).as("bn")), "part")
    PartitionedTable.commit(spark, cDir, spark.range(10).select(
      col("id").as("kc"), lit("all").as("part"),
      concat(lit("c"), col("id")).as("cn")), "part")
    Seq(("f", fDir), ("b", bDir), ("c", cDir)).foreach { case (n, d) =>
      GraftCatalog.register(spark, "cbo", n, d, partCol = Some("part"))
      PartitionedTable.analyzeTable(spark, d)
    }
    val sql =
      """SELECT f.k, b.bn, c.cn
        |FROM graft.cbo.f f
        |JOIN graft.cbo.b b ON f.kb = b.kb
        |JOIN graft.cbo.c c ON f.kc = c.kc""".stripMargin
    def bottomJoinDirs(q: String): Set[String] = {
      val plan = spark.sql(q).queryExecution.optimizedPlan
      val joins = plan.collect { case j: Join => j }
      assert(joins.size === 2, s"expected a 2-join chain: $plan")
      joins.last.collect {
        case r: DataSourceV2ScanRelation => r.scan match {
          case w: V1ScanWrapper =>
            w.v1Scan.asInstanceOf[GraftScan].spec.dir
        }
      }.toSet
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try {
      val withStats = bottomJoinDirs(sql)
      assert(withStats === Set(fDir, cDir),
        s"with stats the reorder joins the selective dim first: $withStats")
      // the ANALYZE NDVs drive the cardinality: the reordered chain's
      // estimated row count is ~|F|·|C|/ndv(kc) = 200 (HLL tolerance)
      val est = spark.sql(sql).queryExecution.optimizedPlan.stats.rowCount
      assert(est.exists(r => r.toLong > 120L && r.toLong < 320L),
        s"NDV-driven join cardinality must be ~200: $est")
      // NEGATIVE CONTROL: statistics off (row/byte estimation capped
      // out, column stats disabled) → reorder has nothing to cost,
      // the syntactic order stands
      spark.conf.set("spark.graft.stats.colStats", "false")
      spark.conf.set("spark.graft.stats.maxSlicesRows", "0")
      spark.conf.set("spark.graft.stats.maxSlicesBytes", "0")
      val withoutStats = bottomJoinDirs(sql)
      assert(withoutStats === Set(fDir, bDir),
        s"without statistics the syntactic order stands: $withoutStats")
      // statistics may never change results
      spark.conf.unset("spark.graft.stats.colStats")
      spark.conf.unset("spark.graft.stats.maxSlicesRows")
      spark.conf.unset("spark.graft.stats.maxSlicesBytes")
      val on = spark.sql(sql).collect().map(_.toString).sorted
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val off = spark.sql(sql).collect().map(_.toString).sorted
      assert(on.toSeq === off.toSeq && on.length === 200,
        s"reorder must be plan-only: ${on.length} vs ${off.length}")
    } finally {
      spark.conf.unset("spark.graft.stats.colStats")
      spark.conf.unset("spark.graft.stats.maxSlicesRows")
      spark.conf.unset("spark.graft.stats.maxSlicesBytes")
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      spark.conf.unset("spark.sql.cbo.enabled")
    }
    Seq("f", "b", "c").foreach(GraftCatalog.unregister("cbo", _))
  }

  test("equi-height histograms: CBO selectivity on a skewed predicate flips with histogram on vs off; rows identical") {
    GraftScanStats.ensureInstalled(spark)
    val dir = freshStore("grafthist")
    // HEAVILY skewed: 900 of 1000 rows carry s=0, the rest spread over
    // 1..100 — uniform NDV-based selectivity estimates `s = 0` at
    // ~rows/ndv ≈ 10, the histogram sees ~90% of bins pinned at 0
    PartitionedTable.commit(spark, dir, spark.range(1000).select(
      col("id").as("k"), lit("all").as("part"),
      when(col("id") < 900, 0L).otherwise((col("id") % 100) + 1).as("s")),
      "part")
    GraftCatalog.register(spark, "hstats", "t", dir, partCol = Some("part"))
    val stats = PartitionedTable.analyzeTable(spark, dir,
      histCols = Seq("s"), histBuckets = 32)
    val hist = stats("stats.col.s.histogram")
    assert(hist.startsWith("31.25|"), s"height = 1000/32: $hist")
    assert(hist.split("\\|")(1).split(";").length === 32, hist)
    // the scan serves it through the V2 colstats surface
    val scan = scanOf(spark.sql("SELECT s FROM graft.hstats.t"))
    val served = scan.estimateStatistics().columnStats().values()
      .iterator().next()
    assert(served.histogram().isPresent, "scan must serve the histogram")
    assert(served.histogram().get().bins().length === 32)

    val sql = "SELECT * FROM graft.hstats.t WHERE s = 0"
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      def estimated: BigInt =
        spark.sql(sql).queryExecution.optimizedPlan.stats.rowCount
          .getOrElse(fail("CBO must estimate the filter"))
      val withHist = estimated
      assert(withHist > BigInt(500),
        s"the histogram must see the skew (~900 rows): $withHist")
      // NEGATIVE CONTROL: re-ANALYZE without the histogram (the stats
      // key space replaces atomically) → uniformity assumption returns
      PartitionedTable.analyzeTable(spark, dir)
      val without = estimated
      assert(without < BigInt(100),
        s"without the histogram the uniform NDV estimate (~10) stands: $without")
      assert(spark.sql(sql).count() === 900L, "estimates never change rows")
    } finally spark.conf.unset("spark.sql.cbo.enabled")
    GraftCatalog.unregister("hstats", "t")
  }

  test("DATE histograms persist in internal day units and flip CBO's estimate on calendar skew") {
    GraftScanStats.ensureInstalled(spark)
    val dir = freshStore("grafthistd")
    // 90% of rows land on one day, the rest spread over 50 days
    PartitionedTable.commit(spark, dir, spark.range(1000).select(
      col("id").as("k"), lit("all").as("part"),
      when(col("id") < 900, to_date(lit("1996-03-15")))
        .otherwise(date_add(to_date(lit("1996-04-01")),
          (col("id") % 50).cast("int"))).as("d")), "part")
    GraftCatalog.register(spark, "dhist", "t", dir, partCol = Some("part"))
    val stats = PartitionedTable.analyzeTable(spark, dir,
      histCols = Seq("d"), histBuckets = 16)
    // bins are epoch DAYS (catalyst-internal units): 1996-03-15 = 9570
    val firstLo = stats("stats.col.d.histogram")
      .split("\\|")(1).split(";")(0).split(",")(0).toDouble
    assert(firstLo === 9570.0, s"bins must be internal day units: $firstLo")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      def estimated: BigInt = spark.sql(
        "SELECT * FROM graft.dhist.t WHERE d = DATE '1996-03-15'")
        .queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(fail("CBO must estimate the filter"))
      val withHist = estimated
      assert(withHist > BigInt(500),
        s"the date histogram must see the skew (~900 rows): $withHist")
      PartitionedTable.analyzeTable(spark, dir) // no histogram
      assert(estimated < BigInt(100),
        s"without it the uniform NDV estimate stands: $estimated")
      assert(spark.sql(
        "SELECT * FROM graft.dhist.t WHERE d = DATE '1996-03-15'")
        .count() === 900L)
    } finally spark.conf.unset("spark.sql.cbo.enabled")
    GraftCatalog.unregister("dhist", "t")
  }

  test("stats staleness: column stats drop past maxStaleCommits (logged, conf-gated); exact row counts survive; DESCRIBE surfaces the distance") {
    import spark.implicits._
    GraftScanStats.ensureInstalled(spark)
    val dir = freshStore("graftstale")
    PartitionedTable.commit(spark, dir, table(1000), "part") // v0
    GraftCatalog.register(spark, "sstats", "t", dir, partCol = Some("part"))
    PartitionedTable.analyzeTable(spark, dir) // pinned to v0
    def colStatsOf() = scanOf(
      spark.sql("SELECT k, v FROM graft.sstats.t")).estimateStatistics()
    assert(!colStatsOf().columnStats().isEmpty, "fresh stats serve")
    // 3 commits past the analyze
    (1 to 3).foreach { i =>
      PartitionedTable.merge(spark, dir,
        Seq((i.toLong, s"p${i % 4}", 0L, "upsert")).toDF("k", "part", "v", "op"),
        "k", "part")
    }
    spark.conf.set("spark.graft.stats.maxStaleCommits", "3")
    try {
      val st = colStatsOf()
      assert(st.columnStats().isEmpty,
        "3 commits past the analyze at maxStaleCommits=3 → stats dropped")
      assert(st.numRows().isPresent && st.numRows().getAsLong === 1000L,
        "exact footer row counts are independent of ANALYZE staleness")
      // DESCRIBE EXTENDED surfaces the distance (derived, not persisted)
      val described = spark.sql("DESCRIBE TABLE EXTENDED graft.sstats.t")
        .collect().map(_.mkString("|")).mkString("\n")
      assert(described.contains("stats.stale_commits"), described)
      assert(described.contains("stats.stale_commits|3") ||
        described.contains("stats.stale_commits=3"), described)
    } finally spark.conf.unset("spark.graft.stats.maxStaleCommits")
    // default threshold (64) keeps serving at distance 3
    assert(!colStatsOf().columnStats().isEmpty,
      "below the threshold the pinned stats still serve")
    // re-ANALYZE resets the distance
    PartitionedTable.analyzeTable(spark, dir)
    spark.conf.set("spark.graft.stats.maxStaleCommits", "3")
    try assert(!colStatsOf().columnStats().isEmpty,
      "a fresh ANALYZE serves under the same threshold")
    finally spark.conf.unset("spark.graft.stats.maxStaleCommits")
    GraftCatalog.unregister("sstats", "t")
  }

  test("timestamp min/max render under FIXED UTC: a non-UTC session round-trips exact CBO bounds") {
    GraftScanStats.ensureInstalled(spark)
    val dir = freshStore("grafttz")
    PartitionedTable.commit(spark, dir, spark.range(10).select(
      col("id").as("k"), lit("all").as("part"),
      to_timestamp(concat(lit("1996-03-"), (col("id") + 10).cast("string"),
        lit(" 12:00:00"))).as("ts")), "part")
    GraftCatalog.register(spark, "tzstats", "t", dir, partCol = Some("part"))
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val stats = PartitionedTable.analyzeTable(spark, dir, Seq("ts"))
      // rendered under UTC regardless of the LA session
      assert(stats("stats.col.ts.min") === "1996-03-10 12:00:00.000000",
        stats("stats.col.ts.min"))
      assert(stats("stats.col.ts.max") === "1996-03-19 12:00:00.000000")
      // ...and the scan's UTC parse round-trips to the exact micros
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val rel = spark.sql("SELECT ts FROM graft.tzstats.t")
        .queryExecution.optimizedPlan.collectFirst {
          case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => r
        }.getOrElse(fail("no V2 scan relation"))
      val tsStat = rel.stats.attributeStats.toSeq
        .find(_._1.name == "ts").map(_._2)
        .getOrElse(fail("no ColumnStat for ts"))
      val expectedMin = java.time.Instant.parse("1996-03-10T12:00:00Z")
        .getEpochSecond * 1000000L
      assert(tsStat.min.contains(expectedMin),
        s"UTC round-trip must not shift by the session offset: ${tsStat.min}")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.set("spark.sql.session.timeZone", prevTz)
    }
    GraftCatalog.unregister("tzstats", "t")
  }

  test("rule is idempotent and leaves non-graft scans alone") {
    GraftScanStats.ensureInstalled(spark)
    GraftScanStats.ensureInstalled(spark)
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[GraftScanStats]) === 1)
    // a plain parquet-backed frame still plans and runs
    val tmp = Files.createTempDirectory("graftstatspq").toString + "/p"
    spark.range(10).write.parquet(tmp)
    assert(spark.read.parquet(tmp).count() === 10L)
  }
}
