package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Airport reference dim: IATA code → display name (public IATA data,
  * major US airports — the domain of the reference's flight feed).
  *
  * The reference intended a name column on dim_airport but zipped
  * `airportCodeArray`/`airportNameArray` columns that never exist in its
  * own silver schema (`loadToWarehouse.py:61`); the feed genuinely
  * carries no airport display names, so the correct fix is what every
  * warehouse does: a conformed reference dim joined at load. Codes
  * missing here fall back to the code itself (never null).
  *
  * At scale this is the canonical broadcast dim — a few thousand rows
  * worldwide, joined map-side. */
object AirportRef {

  val names: Seq[(String, String)] = Seq(
    "ATL" -> "Hartsfield-Jackson Atlanta International Airport",
    "BOS" -> "Boston Logan International Airport",
    "BWI" -> "Baltimore/Washington International Airport",
    "CLT" -> "Charlotte Douglas International Airport",
    "DCA" -> "Ronald Reagan Washington National Airport",
    "DEN" -> "Denver International Airport",
    "DFW" -> "Dallas/Fort Worth International Airport",
    "DTW" -> "Detroit Metropolitan Wayne County Airport",
    "EWR" -> "Newark Liberty International Airport",
    "FLL" -> "Fort Lauderdale-Hollywood International Airport",
    "IAD" -> "Washington Dulles International Airport",
    "IAH" -> "George Bush Intercontinental Airport",
    "JFK" -> "John F. Kennedy International Airport",
    "LAS" -> "Harry Reid International Airport",
    "LAX" -> "Los Angeles International Airport",
    "LGA" -> "LaGuardia Airport",
    "MCO" -> "Orlando International Airport",
    "MDW" -> "Chicago Midway International Airport",
    "MIA" -> "Miami International Airport",
    "MSP" -> "Minneapolis-Saint Paul International Airport",
    "OAK" -> "Oakland International Airport",
    "ORD" -> "Chicago O'Hare International Airport",
    "PHL" -> "Philadelphia International Airport",
    "PHX" -> "Phoenix Sky Harbor International Airport",
    "SAN" -> "San Diego International Airport",
    "SEA" -> "Seattle-Tacoma International Airport",
    "SFO" -> "San Francisco International Airport",
    "SLC" -> "Salt Lake City International Airport",
    "TPA" -> "Tampa International Airport")

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    names.toDF("code", "ref_name")
  }
}
