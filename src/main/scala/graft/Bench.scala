package graft
import org.apache.spark.sql.SparkSession

import scala.util.control.NonFatal

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failures are reported per-query ("err") and make
  * the process exit nonzero — a round where queries crash must never look
  * like a (fast) successful bench.
  */
object Bench {

  /** Timed passes per query; the reported figure is the median. Single-run
    * timings on local[32] carry ±0.2 s of scheduler/GC noise — enough to
    * make round-over-round deltas on sub-second queries unattributable.
    * The median of three kills outliers in either direction while keeping
    * bench wall time bounded (3× the timed pass; the warm-up amortizes). */
  private val TimedPasses = 3

  def main(args: Array[String]): Unit = {
    // `Bench merge a.json b.json …` — no timing: fold N completed quiet
    // runs into ONE per-query-median board. Box noise on local[32]
    // moves single-run TOTALS by tens of seconds at identical canaries;
    // per-query medians across runs are the stable signal (BENCH_NOTES'
    // A/B protocol), so the merged board is the round's definitive JSON
    // rather than whichever single run happened to land quietest.
    if (args.nonEmpty && args(0) == "merge") { mergeBoards(args.drop(1)); return }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Optional comma-separated query-name filter for local iteration
    // (never set by the driver: absent → the full registered board).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    // A typo in the filter must not silently yield an empty/partial bench
    // that still writes a plausible result file: every requested name has
    // to resolve against the registered board, or the run dies here.
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      if (unknown.nonEmpty) {
        System.err.println(
          s"[bench] SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
        sys.exit(2)
      }
    }
    def selected = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Static conf, default 100: the JVM-wide cache of COMPILED
      // whole-stage-codegen classes. A 160-query board has far more
      // generated stages than 100, so with round-robin pass
      // interleaving every timed pass would re-Janino-compile every
      // stage it runs (~0.3 s uniform inflation, measured) — sized to
      // the board, the warm-up pass compiles each stage once and every
      // timed pass reuses it, same as production executors that serve
      // one plan repeatedly.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, parquet footer caches, scheduler) on a
    // trivial scan so the first timed query doesn't absorb JVM startup.
    // NonFatal only: an OOM or JVM-fatal error here would corrupt every
    // subsequent measurement — let it crash the run instead.
    try spark.read.parquet(s"$sfDir/nation.parquet").count()
    catch { case NonFatal(_) => () }
    // Untimed per-query warm-up pass over the SAME data directory: each
    // query's first execution pays its own whole-stage-codegen + JIT
    // compile (~0.5-2 s on the expression-heavy ones), which measures the
    // compiler, not the engine. Warming on the timed directory itself (not
    // a smaller SF) guarantees the compiled plans are identical — join
    // strategies and AQE stage shapes depend on input sizes, so a
    // small-scale warm-up could compile different codegen than the timed
    // pass executes. Warm-up failures are ignored; the timed pass still
    // surfaces them as "err".
    // The warm-up pass doubles as the CLASSIFICATION pass (round 15):
    // each query is tagged exchange-bound (its executed plan shuffles)
    // or cpu-bound (pure codegen) ONCE, from the same plans the timed
    // passes run. The two-factor normalized total divides each class by
    // its own canary ratio — r14 burned a session proving by hand-built
    // A/B that a +38% shuffle-canary window inflates exchange-heavy
    // rows while codegen rows track the CPU canary; this mechanizes
    // that adjudication.
    //
    // Round 16: classification reads the WRITE'S OWN executed plan via
    // a QueryExecutionListener — `df.queryExecution` is a separate,
    // never-executed QueryExecution whose adaptive plan AQE hasn't
    // finalized (it may still show exchanges an SMJ→BHJ conversion
    // later removes); the listener hands the post-execution plan of
    // the noop save that actually ran. A query whose warm-up THROWS is
    // tagged `unclassified` (not silently cpu-bound): its seconds ride
    // the two-factor total raw rather than under the wrong canary.
    val exchangeBound = scala.collection.mutable.Set.empty[String]
    val classified = scala.collection.mutable.Set.empty[String]
    def hasShuffle(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collect {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          true
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          hasShuffle(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          hasShuffle(q.plan)
      }.contains(true)
    // Round 17 (ADVICE r16): a stale event could outlive its query's 5 s
    // wait and be consumed by the NEXT query's wait, classifying it by
    // the wrong plan. Each event now carries its QueryExecution's
    // planning-tracker end stamp — OUR save's QE is created inside the
    // save call, so every phase of it ends at-or-after the wall clock
    // read just before the save; a straggler from the previous query
    // planned strictly earlier and is ignored by the stamp filter.
    final case class ExecEvt(
        planStampMs: Long, plan: org.apache.spark.sql.execution.SparkPlan)
    @volatile var lastExecuted: Option[ExecEvt] = None
    val classListener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        // only the noop save's own event: a V2 overwrite via
        // DataFrameWriter (funcName "overwrite", root
        // OverwriteByExpressionExec — probed on this Spark build).
        // Fixture-internal actions inside fn() — collects, library
        // parquet commits (V1 DataWritingCommandExec, funcName
        // "save"/"parquet"), eager SQL commands — never match, so they
        // can't be misattributed as the query's plan.
        if (funcName == "overwrite" &&
          qe.executedPlan.nodeName.contains("OverwriteByExpression")) {
          val stamp =
            try qe.tracker.phases.values.map(_.endTimeMs).maxOption
              .getOrElse(Long.MaxValue)
            catch { case NonFatal(_) => Long.MaxValue }
          lastExecuted = Some(ExecEvt(stamp, qe.executedPlan))
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(classListener)
    try selected.sortBy(_._1).foreach { case (name, fn) =>
      try {
        lastExecuted = None
        val t0Ms = System.currentTimeMillis()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        // listener events post asynchronously; bounded wait for an
        // event whose planning ended at-or-after THIS save started —
        // a stale straggler from the previous query never qualifies
        val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
        while (!lastExecuted.exists(_.planStampMs >= t0Ms) &&
          System.nanoTime() < deadline)
          Thread.sleep(10)
        lastExecuted.filter(_.planStampMs >= t0Ms).foreach { e =>
          classified += name
          if (hasShuffle(e.plan)) exchangeBound += name: Unit
        }
      } catch { case NonFatal(_) => () }
    } finally spark.listenerManager.unregister(classListener)
    // Fixed-cost canary (round 6, after the unattributable fleet-wide r5
    // drift): a data-independent, plan-stable pure-codegen aggregate.
    // Its plan can never change with engine code, so round-over-round
    // movement on "canary" measures the ENVIRONMENT (CPU contention, JIT,
    // GC, thermal), giving every future bench a drift baseline to
    // normalize against. Same median-of-3 protocol as the queries.
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 200000000L, 1L, 32)
        .agg(org.apache.spark.sql.functions.sum("id")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    canaryOnce() // warm-up, untimed
    val canary = (1 to TimedPasses).map(_ => canaryOnce()).sorted.apply(TimedPasses / 2)
    // Shuffle canary (late round 6): the CPU canary stayed FLAT through a
    // fleet-wide +0.1-0.6 s shift on every shuffle-touching query incl.
    // plan-identical ones — environment drift can live in the EXCHANGE
    // path (shuffle write/read, local disk, page cache) where a
    // single-stage codegen agg never looks. This one round-trips a fixed
    // 5M-row repartition so both dimensions are normalizable.
    def shuffleCanaryOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 5000000L, 1L, 32)
        .repartition(32, org.apache.spark.sql.functions.col("id"))
        .agg(org.apache.spark.sql.functions.sum("id")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    shuffleCanaryOnce() // warm-up, untimed
    val shuffleCanary =
      (1 to TimedPasses).map(_ => shuffleCanaryOnce()).sorted.apply(TimedPasses / 2)
    // Passes are interleaved ROUND-ROBIN across the whole board (pass 1 of
    // every query, then pass 2, then pass 3) instead of back-to-back per
    // query: with consecutive passes, one multi-minute stretch of external
    // contention covers all three samples of whichever queries it lands on
    // and survives the median (BENCH_r07 carried a 10× artifact on
    // t11_quality_gate this way). Interleaving spreads each query's samples
    // ~a full board-length apart, so a contiguous stall can own at most one
    // of the three and the median stays clean.
    //
    // Round 17: each pass visits the board in its OWN deterministically
    // shuffled order (seeded by the pass index — boards stay exactly
    // reproducible) instead of the same alphabetical order every pass.
    // With a fixed visit order, a PERIODIC external stall whose period
    // aliases with the pass length hits the same alphabetical
    // neighborhood on every pass and defeats the median (the r15/r16
    // driver-window s24–s35 artifact); rotated orders make consecutive
    // hits land on unrelated queries. Each sample is also stamped with
    // its wall-clock offset from the board start, persisted in the full
    // board file — a contiguous stall is now provable from the artifact
    // itself (a cluster of inflated samples at adjacent offsets across
    // UNRELATED queries) rather than adjudicated by re-running.
    val board = selected.sortBy(_._1)
    def passOrder[T](xs: Seq[T], pass: Int): Seq[T] =
      new scala.util.Random(0x9E3779B97F4A7C15L * (pass + 1)).shuffle(xs)
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val offsets = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val failed = scala.collection.mutable.Set.empty[String]
    val boardStart = System.nanoTime()
    for (pass <- 1 to TimedPasses;
         (name, fn) <- passOrder(board, pass) if !failed(name)) {
      // noop sink, not count(): count() lets Catalyst prune every unused
      // column, so projection-only queries would be timed at ~zero cost.
      // The noop DSv2 writer consumes every row in full.
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
        offsets(name) = ((t0 - boardStart) / 1e9) :: offsets(name)
      } catch { case NonFatal(e) =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        failed += name // a failed pass aborts the query's remaining passes
      }
    }
    val failures = board.map(_._1).filter(failed).toList
    val results = board.map { case (name, _) =>
      val times = samples(name)
      val median = times.sorted.drop(times.size / 2).headOption
      name -> (if (!failed(name) && times.size == TimedPasses) median.get.toString
               else "\"err\"")
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if !v.startsWith("\"") => v.toDouble }.sum
    // Scaling-slope audit: the 2× gate is measured at ONE scale factor,
    // which is blind to a quadratic hiding under a small fixture — a
    // query can sit comfortably inside the gate at sf0.1 and still be
    // the one that falls over at 100 TB. When the 10×-smaller sibling
    // directory exists, time the same board there (same protocol: one
    // untimed warm pass — plans differ per SF — then interleaved medians)
    // and report the per-query wall-time ratio. With 10× the data, a
    // scan-bound query rides ≤10× and a fixed-overhead-bound one near
    // 1×; anything whose big-SF time exceeds 10× its small-SF time AND
    // is expensive enough that fixed overhead can't explain it
    // (>1 s) is flagged super-linear for the round's judge to read.
    val smallDir = sfDir.replace("sf0.1", "sf0.01")
    val scaling = if (smallDir != sfDir &&
      new java.io.File(smallDir).isDirectory) {
      selected.sortBy(_._1).foreach { case (name, fn) =>
        if (!failed(name)) {
          try fn(spark, smallDir).write.format("noop").mode("overwrite").save()
          catch { case NonFatal(_) => () }
        }
      }
      val small = scala.collection.mutable.Map.empty[String, List[Double]]
        .withDefaultValue(Nil)
      val smallFailed = scala.collection.mutable.Set.empty[String]
      for (pass <- 1 to TimedPasses;
           (name, fn) <- passOrder(board, pass + TimedPasses)
           if !failed(name) && !smallFailed(name)) {
        val t0 = System.nanoTime()
        try { fn(spark, smallDir).write.format("noop").mode("overwrite").save()
          small(name) = ((System.nanoTime() - t0) / 1e9) :: small(name)
        } catch { case NonFatal(_) => smallFailed += name }
      }
      val ratios = board.flatMap { case (name, _) =>
        val times = small(name)
        if (failed(name) || smallFailed(name) || times.size != TimedPasses) None
        else {
          val med = times.sorted.apply(TimedPasses / 2)
          val big = samples(name).sorted.apply(TimedPasses / 2)
          Some((name, big / math.max(med, 1e-3), big))
        }
      }
      // 12.0, not 10.0: with 10x the data, a scan-bound query scales at
      // EXACTLY 10x, so a 10.0 threshold has zero headroom — d03 (stable
      // 3.5 s big-side across four quiet runs) flagged at ratio 10.17
      // purely because the small side landed fast on the quietest box.
      // 20% over linear still catches what the audit hunts (a hidden
      // quadratic shows ~100x here) without turning linear queries into
      // noise-driven false alarms.
      val flaggedNames = ratios.collect {
        case (name, r, big) if r > 12.0 && big > 1.0 => name
      }
      // locale-independent 2dp rendering (f"" uses the JVM default
      // locale — a comma-decimal locale would corrupt the JSON line)
      val rs = ratios.map { case (k, r, _) =>
        "\"" + k + "\":" + (math.round(r * 100) / 100.0).toString
      }.mkString("{", ",", "}")
      val fl = flaggedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
      s""","scaling":{"small_sf":"$smallDir","ratio_big_over_small":$rs,"superlinear_flagged":$fl}"""
    } else ""
    val eb = results.collect {
      case (n, v) if !v.startsWith("\"") && exchangeBound(n) => v.toDouble
    }.sum
    // warm-up-failed queries that still timed clean: no executed plan
    // to classify from — their seconds ride the two-factor total RAW
    // (under the wrong canary they'd skew merged boards)
    val unclNames = results.collect {
      case (n, v) if !v.startsWith("\"") && !classified(n) => n
    }
    val uncl = results.collect {
      case (n, v) if !v.startsWith("\"") && !classified(n) => v.toDouble
    }.sum
    val cb = total - eb - uncl
    val ebNames = results.collect {
      case (n, v) if !v.startsWith("\"") && exchangeBound(n) => "\"" + n + "\""
    }.mkString("[", ",", "]")
    val unclJson = unclNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    // per-sample provenance: [wall-clock offset from board start, raw
    // duration] per timed pass, chronological — locale-independent 3dp
    def r3(x: Double): String = (math.round(x * 1000) / 1000.0).toString
    val samplesJson = board.map { case (name, _) =>
      val pairs = offsets(name).reverse.zip(samples(name).reverse)
        .map { case (off, dur) => s"[${r3(off)},${r3(dur)}]" }
      "\"" + name + "\":" + pairs.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val boardLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":${failures.size},"passes":$TimedPasses,"stat":"median","canary":$canary,"shuffle_canary":$shuffleCanary,"ref_canary":$RefCanary,"ref_shuffle_canary":$RefShuffleCanary,"normalized_total":${normalizedTotal(total, canary)},"normalized_total_2f":${normalizedTotal2f(cb, eb, canary, shuffleCanary) + uncl},"cpu_bound_seconds":$cb,"exchange_bound_seconds":$eb,"exchange_bound":$ebNames,"unclassified":$unclJson,"sample_walltime":$samplesJson$scaling}"""
    println(boardLine)
    // The driver's capture tail-truncates long stdout: fifteen rounds
    // of BENCH_r*.json carried `parsed: null` because the ~6 KB board
    // line lost its head. Persist the full board to a file and print a
    // SHORT summary as the LAST line, so the tail always holds one
    // complete, parseable JSON verdict.
    val boardPath = "bench/last_board.json"
    try {
      val p = java.nio.file.Paths.get(boardPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (boardLine + "\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] could not persist $boardPath: $e") }
    val superlinear = "\"superlinear_flagged\":(\\[[^\\]]*\\])".r
      .findFirstMatchIn(scaling).map(_.group(1)).getOrElse("[]")
    println(s"""{"metric":"total_summary","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size},"failed":${failures.size},"canary":$canary,"shuffle_canary":$shuffleCanary,"normalized_total_2f":${normalizedTotal2f(cb, eb, canary, shuffleCanary) + uncl},"superlinear_flagged":$superlinear,"full_board":"$boardPath"}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }

  /** Merge N bench JSON lines into one median board (same line format,
    * `stat: "median-of-runs"`). A query must be numeric in EVERY kept
    * run to merge — any kept run's "err" keeps it "err" in the board,
    * so a flaky query can never hide behind its quieter runs. */
  private def mergeBoards(paths: Array[String]): Unit = {
    val (json, failedCount) = mergeBoardsJson(paths.toSeq)
    println(json)
    if (failedCount > 0) sys.exit(1)
  }

  /** Middle element for odd sizes; the AVERAGE of the two middle
    * elements for even sizes — taking the upper one would bias every
    * even-run merged board systematically upward. */
  private[graft] def medianOf(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of nothing")
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** REFERENCE CPU canary for cross-round normalization (round 14):
    * the round-13 definitive quiet board's canary (`bench/r13_quiet6
    * .json`, canary 0.073 on the quietest observed window). Boards now
    * carry `normalized_total` = total ÷ (canary / RefCanary) — the
    * total this box-speed-adjusted run WOULD have posted on the
    * reference window — so round-over-round comparisons stop
    * re-litigating box drift by hand in BENCH_NOTES. The raw total and
    * canaries stay on the line; normalization is a lens, not a
    * replacement. */
  private[graft] val RefCanary = 0.073

  /** REFERENCE SHUFFLE canary (round 15): r13 quiet6's exchange-path
    * figure. Round 14's adjudication found the two canaries MOVE
    * INDEPENDENTLY (CPU flat at +0%, shuffle +38% on the same window),
    * so a single-factor normalization misattributes exchange-path box
    * drift to code. `normalized_total_2f` divides each query class by
    * its own canary ratio — classification comes from the executed
    * plans (any shuffle exchange → exchange-bound) and rides the line
    * as `exchange_bound` so merged boards can recompute it. */
  private[graft] val RefShuffleCanary = 0.337

  private[graft] def normalizedTotal(total: Double, canary: Double): Double =
    if (canary <= 0) total else total * (RefCanary / canary)

  /** Two-factor normalization: cpu-bound seconds scale by the CPU
    * canary ratio, exchange-bound seconds by the shuffle canary ratio. */
  private[graft] def normalizedTotal2f(
      cpuSeconds: Double, exchangeSeconds: Double,
      canary: Double, shuffleCanary: Double): Double =
    normalizedTotal(cpuSeconds, canary) +
      (if (shuffleCanary <= 0) exchangeSeconds
       else exchangeSeconds * (RefShuffleCanary / shuffleCanary))

  /** CANARY GATE (round 13): quiet windows used to be picked by hand —
    * boards spanning 139-217 s at identical code were excluded from the
    * merge by eyeballing their canaries against BENCH_NOTES. The merge
    * now gates mechanically: a run whose CPU or shuffle canary deviates
    * more than this fraction from the INPUT MEDIAN canary measured a
    * different box, not different code, and is excluded (recorded in
    * the output's `excluded_runs` with the reason). Gating needs a
    * quorum — with fewer than 3 runs there is no robust median to
    * deviate from, so everything merges. */
  private[graft] val CanaryGate = 0.25

  private[graft] def mergeBoardsJson(paths: Seq[String]): (String, Int) = {
    require(paths.nonEmpty, "usage: Bench merge <bench.json> [bench.json ...]")
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val all = paths.map(p => p -> mapper.readTree(new java.io.File(p)))
    val cpuMed = medianOf(all.map(_._2.get("canary").asDouble))
    val shMed = medianOf(all.map(_._2.get("shuffle_canary").asDouble))
    def reasonOf(r: com.fasterxml.jackson.databind.JsonNode): Option[String] = {
      def dev(x: Double, med: Double) = math.abs(x - med) / math.max(med, 1e-9)
      val c = r.get("canary").asDouble
      val s = r.get("shuffle_canary").asDouble
      val bad = Seq(
        ("canary", c, cpuMed), ("shuffle_canary", s, shMed)
      ).filter { case (_, x, med) => dev(x, med) > CanaryGate }
      if (bad.isEmpty) None
      else Some(bad.map { case (n, x, med) =>
        f"$n $x%.3f deviates ${dev(x, med) * 100}%.0f%% from input median $med%.3f"
      }.mkString("; "))
    }
    val gated =
      if (all.size < 3) all.map { case (p, r) => (p, r, None: Option[String]) }
      else all.map { case (p, r) => (p, r, reasonOf(r)) }
    val kept0 = gated.collect { case (p, r, None) => (p, r) }
    // pathological spread (every run outside the gate of an averaged
    // even-size median): nothing is adjudicable — keep everything and
    // let the reader see the canaries, never emit an empty board
    val (kept, excluded) =
      if (kept0.nonEmpty) (kept0, gated.collect { case (p, _, Some(why)) => (p, why) })
      else (all, Seq.empty[(String, String)])
    val runs = kept.map(_._2)
    val names = runs.head.get("queries").fieldNames.asScala.toSeq
    val perQuery = names.map { q =>
      val vals = runs.flatMap { r =>
        Option(r.get("queries").get(q)).filter(_.isNumber).map(_.asDouble)
      }
      q -> (if (vals.size == runs.size) Some(medianOf(vals)) else None)
    }
    val failedCount = perQuery.count(_._2.isEmpty)
    val qs = perQuery.map { case (q, v) =>
      "\"" + q + "\":" + v.map(_.toString).getOrElse("\"err\"")
    }.mkString("{", ",", "}")
    val total = perQuery.flatMap(_._2).sum
    val canary = medianOf(runs.map(_.get("canary").asDouble))
    val shuffle = medianOf(runs.map(_.get("shuffle_canary").asDouble))
    val sf = runs.head.get("sf").asText
    val sources = kept.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val excl = excluded.map { case (p, why) =>
      s"""{"path":"${esc(p)}","reason":"${esc(why)}"}"""
    }.mkString("[", ",", "]")
    // two-factor recompute over the MERGED medians: classification =
    // the union of the kept runs' exchange_bound tags (plan shapes are
    // code-identical across runs; union absorbs a warm-up hiccup).
    // Old boards without the field merge without the 2f lens.
    val ebNames: Set[String] = runs.flatMap(r =>
      Option(r.get("exchange_bound")).toSeq.flatMap(_.elements().asScala
        .map(_.asText()))).toSet
    // a query only counts as unclassified when NO kept run classified
    // it (classification is plan-derived and code-identical across
    // runs; any run's tag stands for all)
    val unclNames: Set[String] = runs.map(r =>
      Option(r.get("unclassified")).map(_.elements().asScala
        .map(_.asText()).toSet).getOrElse(Set.empty[String]))
      .reduceOption(_ intersect _).getOrElse(Set.empty)
      .diff(ebNames)
    val twoFactor = if (ebNames.isEmpty) "" else {
      val eb = perQuery.collect {
        case (q, Some(v)) if ebNames.contains(q) => v
      }.sum
      val uncl = perQuery.collect {
        case (q, Some(v)) if unclNames.contains(q) => v
      }.sum
      val cb = total - eb - uncl
      s""","ref_shuffle_canary":$RefShuffleCanary,"normalized_total_2f":${normalizedTotal2f(cb, eb, canary, shuffle) + uncl},"cpu_bound_seconds":$cb,"exchange_bound_seconds":$eb,"exchange_bound":${ebNames.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},"unclassified":${unclNames.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    }
    (s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sf","failed":$failedCount,"runs":${runs.size},"stat":"median-of-runs","canary":$canary,"shuffle_canary":$shuffle,"ref_canary":$RefCanary,"normalized_total":${normalizedTotal(total, canary)}$twoFactor,"sources":$sources,"excluded_runs":$excl}""",
      failedCount)
  }
}
