package graft.pipeline

import java.nio.file.Files
import java.sql.Date
import java.time.LocalDate

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end medallion pipeline test (SURVEY §5.4): CSV → bronze →
  * silver → gold → warehouse in one JVM, with layer-schema assertions,
  * on-disk partition-layout checks, golden aggregates computed
  * independently from the fixture model, and an idempotence re-run. */
class PipelineSpec extends SparkSpec {

  private val asOf = Date.valueOf("2022-06-01")
  private lazy val root = Files.createTempDirectory("graft-pipe").toString
  private lazy val paths = Pipeline.Paths.under(root)

  private lazy val firstRun: Option[Long] = {
    FlightsFixture.writeCsv(spark, s"$root/raw_csv")
    val source = Sources.csv(spark, s"$root/raw_csv")
    Pipeline.run(spark, source, paths, asOf)
  }

  // ---- model-side expectations from the fixture rows ----
  private val model = FlightsFixture.rows
  private val cleanRows = model.filter(_.clean)

  test("bronze: watermark, partition columns, on-disk layout") {
    assert(firstRun === Some(199L))
    val bronze = spark.read.parquet(paths.bronze)
    assert(bronze.count() === 200)
    assert(Seq("year", "month", "day").forall(bronze.columns.contains))
    // partition pruning layout: year=2022/month=4/day=16 must exist on disk
    assert(Files.exists(java.nio.file.Paths.get(
      s"${paths.bronze}/year=2022/month=4/day=16")))
  }

  test("silver: quality filter, typed columns, arrays, no raw segments") {
    val silver = spark.read.parquet(paths.silver)
    assert(silver.count() === cleanRows.size.toLong)
    val sch = silver.schema
    assert(sch("searchDate").dataType === DateType)
    assert(sch("flightDate").dataType === DateType)
    assert(sch("travelDuration").dataType === IntegerType)
    def elemType(c: String) = sch(c).dataType.asInstanceOf[ArrayType].elementType
    assert(elemType("arrivalTimeArray") === TimestampType)
    assert(elemType("airlineCodeArray") === StringType)
    assert(elemType("durationSecondsArray") === IntegerType)
    assert(!silver.columns.exists(_.startsWith("segments")))
    // trim applied
    val fbc = silver.select("fareBasisCode").distinct().collect().map(_.getString(0))
    assert(fbc.forall(c => c == c.trim))
    // sentinel scrub: no nulls inside int arrays
    val badInts = silver.select(explode(col("durationSecondsArray")).as("v"))
      .filter(col("v").isNull).count()
    assert(badInts === 0)
  }

  test("gold: revenue aggregate matches the independently-computed golden") {
    firstRun
    val gold = spark.table("gold.revenue_n_seat_remain_ym")
    assert(gold.columns.sorted.toSeq ===
      Seq("airline", "avg_seat_remaining", "month", "total_fare", "year"))
    val got = gold.collect().map(r =>
      (r.getAs[Int]("year"), r.getAs[Int]("month"), r.getAs[String]("airline")) ->
        (r.getAs[Double]("total_fare"), r.getAs[Double]("avg_seat_remaining"))).toMap

    val expected = cleanRows
      .filter(_.singleAirline)
      .filter(r => !LocalDate.parse(r.flightDate).isAfter(asOf.toLocalDate))
      .groupBy { r =>
        val fd = LocalDate.parse(r.flightDate)
        (fd.getYear, fd.getMonthValue, r.airlineCodes.head)
      }
      .map { case (k, rs) =>
        k -> (rs.map(_.totalFare).sum,
          BigDecimal(rs.map(_.seatsRemaining).sum.toDouble / rs.size)
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, (fare, seats)) =>
      assert(math.abs(got(k)._1 - fare) < 1e-6, s"total_fare for $k")
      assert(math.abs(got(k)._2 - seats) < 0.011, s"avg_seat_remaining for $k")
    }
  }

  test("gold: fare-basis duration aggregate present with trimmed keys") {
    firstRun
    val fbc = spark.table("gold.fbc_travel_duration_relation")
    assert(fbc.columns.sorted.toSeq === Seq("avg_duration", "fareBasisCode"))
    val keys = fbc.collect().map(_.getAs[String]("fareBasisCode")).toSet
    assert(keys === cleanRows.map(_.fareBasisCode.trim).toSet)
  }

  test("warehouse: dims are unique, fact is array-free with count_segments") {
    firstRun
    val dimDate = spark.table("warehouse.dim_date")
    val expectedDates = cleanRows
      .flatMap(r => Seq(r.searchDate, r.flightDate)).distinct.size
    assert(dimDate.count() === expectedDates.toLong)
    assert(dimDate.select("day").distinct().count() === expectedDates.toLong)
    assert(dimDate.columns.sorted.toSeq === Seq("day", "dayOfMonth", "day_of_week_name",
      "day_of_week_number", "month", "month_name", "quarter", "year"))

    val dimAirline = spark.table("warehouse.dim_airline")
    assert(dimAirline.count() === dimAirline.select("code").distinct().count())
    assert(dimAirline.collect().map(_.getAs[String]("code")).toSet ===
      cleanRows.flatMap(_.airlineCodes).toSet)

    val dimAirport = spark.table("warehouse.dim_airport")
    assert(dimAirport.count() === dimAirport.select("code").distinct().count())
    val airportNames = dimAirport.collect()
      .map(r => r.getAs[String]("code") -> r.getAs[String]("name")).toMap
    // real display names from the AirportRef reference dim, not code echoes
    assert(airportNames("LGA") === "LaGuardia Airport")
    assert(airportNames("ORD") === "Chicago O'Hare International Airport")
    assert(airportNames.forall { case (c, n) => n != null && n != c },
      s"every fixture code should resolve to a real name: $airportNames")

    val fact = spark.table("warehouse.fact_flight_activites")
    assert(fact.count() === cleanRows.size.toLong)
    assert(fact.columns.contains("count_segments"))
    assert(!fact.schema.fields.exists(_.dataType.isInstanceOf[ArrayType]))
    assert(Files.exists(java.nio.file.Paths.get(
      s"${paths.warehouse}/fact_flight_activites/year=2022/month=4/day=16")))
  }

  test("idempotence: re-running the full pipeline changes nothing") {
    firstRun
    val before = Map(
      "bronze" -> spark.read.parquet(paths.bronze).count(),
      "silver" -> spark.read.parquet(paths.silver).count(),
      "dim_date" -> spark.table("warehouse.dim_date").count(),
      "dim_airline" -> spark.table("warehouse.dim_airline").count(),
      "dim_airport" -> spark.table("warehouse.dim_airport").count(),
      "fact" -> spark.table("warehouse.fact_flight_activites").count(),
      "gold1" -> spark.table("gold.revenue_n_seat_remain_ym").count())
    val goldBefore = spark.table("gold.revenue_n_seat_remain_ym")
      .agg(round(sum("total_fare"), 2)).head().getDouble(0)

    val wm2 = Pipeline.run(spark, Sources.csv(spark, s"$root/raw_csv"), paths, asOf)
    assert(wm2 === Some(199L))

    val after = Map(
      "bronze" -> spark.read.parquet(paths.bronze).count(),
      "silver" -> spark.read.parquet(paths.silver).count(),
      "dim_date" -> spark.table("warehouse.dim_date").count(),
      "dim_airline" -> spark.table("warehouse.dim_airline").count(),
      "dim_airport" -> spark.table("warehouse.dim_airport").count(),
      "fact" -> spark.table("warehouse.fact_flight_activites").count(),
      "gold1" -> spark.table("gold.revenue_n_seat_remain_ym").count())
    assert(after === before)
    val goldAfter = spark.table("gold.revenue_n_seat_remain_ym")
      .agg(round(sum("total_fare"), 2)).head().getDouble(0)
    assert(goldAfter === goldBefore)
  }

  test("star query: fact joins broadcast dims and matches silver totals") {
    firstRun
    val star = Warehouse.starRevenue(spark)
    val plan = star.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast dims in:\n$plan")
    // every silver row lands in exactly one (month_name, airport) cell
    val total = star.agg(sum("n_itineraries")).head().getLong(0)
    assert(total === spark.read.parquet(paths.silver).count())
  }

  test("the star schema is reachable through the engine's OWN catalog: graft SQL equals the DataFrame star query") {
    firstRun
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("month_name", "code", "total_fare", "n_itineraries").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val viaSql = Warehouse.starRevenueSql(spark)
    assert(rows(viaSql) === rows(Warehouse.starRevenue(spark)),
      "graft.warehouse.* must serve the same star the Hive mirror does")
    assert(rows(viaSql).nonEmpty)
    // the dims resolve through graft too, versioned (history exists)
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.warehouse.dim_airport")
      .head().getLong(0) ===
      spark.table("warehouse.dim_airport").count())
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.warehouse.`fact_flight_activites$history`")
      .head().getLong(0) >= 1L)
  }

  test("partition pruning: a year/month predicate reaches the bronze scan") {
    firstRun
    val q = spark.read.parquet(paths.bronze)
      .filter(col("year") === 2022 && col("month") === 4)
      .select("index")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("(month#") ,
      s"expected partition filters in:\n$plan")
    val expected = model.count(_.searchDate.startsWith("2022-04"))
    assert(q.count() === expected.toLong)
  }

  test("partitioned writes: per-day file count bounded, intra-day salt fans out") {
    firstRun
    import scala.jdk.CollectionConverters._
    // every (year,month,day) leaf holds at most FilesPerDay parquet files
    // per batch (the salt bounds files AND writer tasks at once)
    for (layer <- Seq(paths.bronze, paths.silver)) {
      val dayDirs = scala.util.Using.resource(Files.walk(java.nio.file.Paths.get(layer))) {
        _.iterator().asScala
          .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("day="))
          .toList
      }
      assert(dayDirs.nonEmpty, s"no day partitions under $layer")
      dayDirs.foreach { d =>
        val n = scala.util.Using.resource(Files.list(d)) {
          _.iterator().asScala.count(_.getFileName.toString.endsWith(".parquet"))
        }
        assert(n >= 1 && n <= Pipeline.FilesPerDay,
          s"$d has $n files, want 1..${Pipeline.FilesPerDay}")
      }
    }
    // the salt genuinely spreads a ONE-day batch over multiple writer
    // tasks (pre-AQE; tiny test batches may legitimately coalesce back)
    val spread = spark.read.parquet(paths.bronze)
      .filter(col("year") === 2022 && col("month") === 4 && col("day") === 16)
      .select(pmod(hash(col("index")), lit(Pipeline.FilesPerDay)).as("salt"))
      .distinct().count()
    assert(spread > 1, "single-day batch must hash to >1 salt bucket")
  }

  test("incremental: a grown source appends only the new rows") {
    firstRun
    // a second fixture epoch: same schema, indexes 200-219
    val extra = FlightsFixture.df(spark)
      .withColumn("index", col("index") + 200)
      .withColumn("legId", concat(lit("x"), col("legId")))
      .limit(20)
    val grown = FlightsFixture.df(spark).unionByName(extra)
    val wm = Pipeline.run(spark, grown, paths, asOf)
    assert(wm === Some(219L))
    assert(spark.read.parquet(paths.bronze).count() === 220)
    // silver grew by exactly the clean subset of the 20 new rows
    val newClean = spark.read.parquet(paths.silver)
      .filter(col("index") >= 200).count()
    assert(newClean > 0 && newClean <= 20)
    // dims stayed unique
    val dimAirline = spark.table("warehouse.dim_airline")
    assert(dimAirline.count() === dimAirline.select("code").distinct().count())
  }
}
