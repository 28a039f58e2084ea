package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Deterministic flights-shaped fixture per FIXTURES.md §B.1 — 200 rows,
  * every dirty-data path represented: padded codes, malformed/null
  * durations, baseFare>totalFare rows, negative seats, null packed
  * columns, sentinel int-array elements, multi-airline itineraries. */
object FlightsFixture {

  final case class Raw(
      index: Long, legId: String, searchDate: String, flightDate: String,
      startingAirport: String, destinationAirport: String, fareBasisCode: String,
      travelDuration: String, elapsedDays: Int,
      isBasicEconomy: Boolean, isRefundable: Boolean, isNonStop: Boolean,
      baseFare: Double, totalFare: Double, seatsRemaining: Int,
      totalTravelDistance: java.lang.Double,
      segDepTime: String, segArrTime: String, segArrAirport: String,
      segDepAirport: String, segAirlineCode: String, segAirlineName: String,
      segEquip: String, segCabin: String, segDurSec: String, segDist: String) {

    def clean: Boolean = baseFare <= totalFare && seatsRemaining >= 0
    def airlineCodes: Seq[String] =
      Option(segAirlineCode).map(_.split("\\|\\|").toSeq).getOrElse(Nil)
    def singleAirline: Boolean = airlineCodes.distinct.size == 1
  }

  private val searchDates = Seq("2022-04-16", "2022-04-17", "2022-05-01", "2022-05-02")
  private val airports = Seq("LGA", "ATL", "BOS", "ORD", "SFO")
  private val airlines = Seq("DL" -> "Delta Air Lines", "AA" -> "American Airlines",
    "UA" -> "United Airlines", "B6" -> "JetBlue Airways")
  private val fareCodes = Seq("QA0NA0MC", "V0AJZNN1", "K0AHZNN1", "LAA0OFBN", "M0AHZNN3", "G0AIZNN9")
  private val durations = Seq("PT2H30M", "PT45M", "PT11H", "2h30m", null, "PT1H5M")

  val rows: Seq[Raw] = (0 until 200).map { i =>
    val sd = searchDates(i % searchDates.size)
    val fd = LocalDate.parse(sd).plusDays((i % 4) * 15L).toString
    val multi = i % 9 == 0
    val (ac, an) = airlines(i % airlines.size)
    val (ac2, an2) = airlines((i + 1) % airlines.size)
    val nSeg = if (i % 2 == 0) 2 else 1
    def packed(one: String, two: => String): String =
      if (nSeg == 1) one else s"$one||$two"
    val pad = i % 5 == 0
    def maybePad(s: String): String = if (pad) s"  $s " else s
    val baseFare = 100.0 + i
    Raw(
      index = i.toLong,
      legId = f"leg$i%04d",
      searchDate = sd,
      flightDate = fd,
      startingAirport = maybePad(airports(i % airports.size)),
      destinationAirport = maybePad(airports((i + 2) % airports.size)),
      fareBasisCode = maybePad(fareCodes(i % fareCodes.size)),
      travelDuration = durations(i % durations.size),
      elapsedDays = i % 4,
      isBasicEconomy = i % 2 == 0,
      isRefundable = i % 3 == 0,
      isNonStop = nSeg == 1,
      baseFare = baseFare,
      totalFare = if (i % 7 == 0) baseFare - 10.0 else baseFare + 20.0,
      seatsRemaining = if (i % 11 == 0) -1 else i % 10,
      totalTravelDistance = if (i % 6 == 0) null else Double.box(500.0 + i),
      segDepTime = if (i % 10 == 0) null
        else packed(s"${fd}T08:40:00.000-04:00", s"${fd}T11:15:00.000-04:00"),
      segArrTime = if (i % 10 == 0) null
        else packed(s"${fd}T10:02:00.000-04:00", s"${fd}T13:47:00.000-04:00"),
      segArrAirport = packed(airports((i + 1) % airports.size), airports((i + 2) % airports.size)),
      segDepAirport = packed(airports(i % airports.size), airports((i + 1) % airports.size)),
      segAirlineCode = if (multi && nSeg == 2) s"$ac||$ac2" else packed(ac, ac),
      segAirlineName = if (multi && nSeg == 2) s"$an||$an2" else packed(an, an),
      segEquip = packed(if (i % 8 == 0) "" else "Boeing 737-800", "Airbus A321"),
      segCabin = packed("coach", if (i % 8 == 0) "" else "coach"),
      segDurSec = packed("4920", Seq("None", "null", " None ", "", "7520")(i % 5)),
      segDist = packed(Seq("None", "null", " None ", "", "544")((i + 2) % 5), "760"))
  }

  def df(spark: SparkSession): DataFrame = {
    val data = rows.map(r => Row(
      r.index, r.legId, r.searchDate, r.flightDate, r.startingAirport,
      r.destinationAirport, r.fareBasisCode, r.travelDuration, r.elapsedDays,
      r.isBasicEconomy, r.isRefundable, r.isNonStop, r.baseFare, r.totalFare,
      r.seatsRemaining, r.totalTravelDistance, r.segDepTime, r.segArrTime,
      r.segArrAirport, r.segDepAirport, r.segAirlineCode, r.segAirlineName,
      r.segEquip, r.segCabin, r.segDurSec, r.segDist))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      FlightSchemas.raw)
  }

  /** Write the fixture as a headered CSV directory (the S5 ingest path).
    * Whitespace-preserving: the padded-code fixtures must survive the
    * round-trip so silver's `trim` has something to do. */
  def writeCsv(spark: SparkSession, path: String): Unit =
    df(spark).coalesce(1).write
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .mode("overwrite").csv(path)
}
