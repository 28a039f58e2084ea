package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the shuffle-elimination tool for the joins
  * that dominate at 100 TB (fact ⋈ fact, fact ⋈ big-dim on a shared key).
  *
  * Writing both sides bucketed (and sorted) by the join key registers the
  * physical layout in the catalog; Catalyst then plans a sort-merge join
  * with NO Exchange on either side — the shuffle is paid once at write
  * time and amortized across every subsequent join on that key. This is
  * the standing answer to "this join shuffles 100 TB every run".
  * (AQE cannot remove those shuffles; only layout can.)
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted catalog table. `buckets` should be
    * sized so one bucket of the LARGEST table fits an executor's memory
    * comfortably (at 100 TB: hundreds to thousands of buckets). */
  def writeBucketed(
      df: DataFrame, table: String, path: String, key: String, buckets: Int): Unit =
    df.write
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket counts the plan contains no Exchange (verify with
    * `.explain`); with AQE it stays a zero-shuffle sort-merge join. */
  def colocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
