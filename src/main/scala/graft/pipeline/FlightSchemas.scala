package graft.pipeline

import org.apache.spark.sql.types._

/** Explicit schemas for the flights pipeline (SURVEY §1.2-§1.3).
  *
  * The reference never declares schemas — JDBC reads take the Postgres
  * catalog types and its upstream pandas ingester force-casts to lossy
  * `float16`/`int16` (`/root/reference/scripts/ingest-data.py:26-32`).
  * We declare the source schema once, with full-precision numerics
  * (`DoubleType` fares — SURVEY §7.4 risk 3), and every layer downstream
  * derives from it; CSV reads never infer.
  */
object FlightSchemas {

  /** The raw itineraries table (Kaggle flightprices + pandas `index` PK) —
    * column set per SURVEY §1.3 / FIXTURES.md §B.1. */
  val raw: StructType = StructType(Seq(
    StructField("index", LongType, nullable = false),
    StructField("legId", StringType),
    StructField("searchDate", StringType),
    StructField("flightDate", StringType),
    StructField("startingAirport", StringType),
    StructField("destinationAirport", StringType),
    StructField("fareBasisCode", StringType),
    StructField("travelDuration", StringType),
    StructField("elapsedDays", IntegerType),
    StructField("isBasicEconomy", BooleanType),
    StructField("isRefundable", BooleanType),
    StructField("isNonStop", BooleanType),
    StructField("baseFare", DoubleType),
    StructField("totalFare", DoubleType),
    StructField("seatsRemaining", IntegerType),
    StructField("totalTravelDistance", DoubleType),
    StructField("segmentsDepartureTimeRaw", StringType),
    StructField("segmentsArrivalTimeRaw", StringType),
    StructField("segmentsArrivalAirportCode", StringType),
    StructField("segmentsDepartureAirportCode", StringType),
    StructField("segmentsAirlineCode", StringType),
    StructField("segmentsAirlineName", StringType),
    StructField("segmentsEquipmentDescription", StringType),
    StructField("segmentsCabinCode", StringType),
    StructField("segmentsDurationInSeconds", StringType),
    StructField("segmentsDistance", StringType)))

  /** Packed `"a||b"` segment columns → their silver array names and element
    * casts (reference `transformToSilver.py:56-90`; SURVEY §1.3). */
  val segmentArrays: Seq[(String, String, String)] = Seq(
    // (raw packed column, silver array column, element kind)
    ("segmentsArrivalTimeRaw", "arrivalTimeArray", "timestamp"),
    ("segmentsDepartureTimeRaw", "departureTimeArray", "timestamp"),
    ("segmentsArrivalAirportCode", "arrivalAirportArray", "string"),
    ("segmentsDepartureAirportCode", "departureAirportArray", "string"),
    ("segmentsAirlineCode", "airlineCodeArray", "string"),
    ("segmentsAirlineName", "airlineNameArray", "string"),
    ("segmentsEquipmentDescription", "equipDescriptionArray", "string"),
    ("segmentsCabinCode", "CabinCodeArray", "string"),
    ("segmentsDurationInSeconds", "durationSecondsArray", "int"),
    ("segmentsDistance", "distanceArray", "int"))
}
