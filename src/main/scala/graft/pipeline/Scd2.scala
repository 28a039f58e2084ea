package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension maintenance — the standard warehouse
  * answer to "dim attributes change over time and facts must join the
  * version that was true at event time" (the reference's dims are
  * append-only type-1; SCD2 is what its airline/airport dims would need
  * the moment a name changes).
  *
  * Row validity is carried as `[effective_from, effective_to)` with
  * `effective_to IS NULL` marking the current version. Applying a batch:
  *
  *   - unchanged keys keep their current row untouched;
  *   - changed keys close the current row (`effective_to = asOf`) and
  *     open a new one (`effective_from = asOf`);
  *   - brand-new keys open their first row;
  *   - keys absent from the batch stay open (a dim batch is a snapshot
  *     of keys it mentions, not of the world);
  *   - history rows pass through untouched.
  *
  * Re-applying the same batch is a no-op (idempotent): after the first
  * apply the current attributes equal the batch attributes, so the
  * change join matches nothing.
  *
  * Scale posture: one join of the CURRENT slice against the batch on the
  * dim key (dims are small relative to facts — broadcast or
  * shuffle-by-key both fine), history rides through as a union with no
  * shuffle; attribute comparison is null-safe (`<=>`). Point-in-time
  * fact enrichment against the result is exactly the native as-of join
  * ([[graft.plans.AsOf]]) on `effective_from`.
  */
object Scd2 {

  /** Apply `batch` (one row per key: `key` columns + `attrs` columns) to
    * an optional existing SCD2 table (same columns + `effective_from` /
    * `effective_to`), effective as of `asOf`. Returns the new full table
    * content. */
  def apply(
      existing: Option[DataFrame], batch: DataFrame,
      key: Seq[String], attrs: Seq[String], asOf: java.sql.Date): DataFrame = {
    val opened = batch.select((key ++ attrs).map(col): _*)
      .withColumn("effective_from", lit(asOf))
      .withColumn("effective_to", lit(null).cast("date"))
    existing match {
      case None => opened
      case Some(ex) =>
        val hist = ex.filter(col("effective_to").isNotNull)
        val cur = ex.filter(col("effective_to").isNull)
        // explicit presence markers: a left-join miss is detected by the
        // marker, never by attr nullness (attrs may be legitimately null)
        val b = batch.select(
          key.map(col) ++ attrs.map(c => col(c).as(s"__b_$c")) :+ lit(true).as("__b_present"): _*)
        // null-safe "any attribute differs"
        val changedCond = attrs.map(c => !(col(c) <=> col(s"__b_$c"))).reduce(_ || _)
        val joined = cur.join(b, key, "left")
        // batch didn't mention the key, or mentioned it unchanged → keep
        val kept = joined
          .filter(col("__b_present").isNull || !changedCond)
          .select(cur.columns.map(col): _*)
        // changed → close the current row at asOf
        val closed = joined
          .filter(col("__b_present").isNotNull && changedCond)
          .select(cur.columns.map(col): _*)
          .withColumn("effective_to", lit(asOf))
        // open a row for changed + brand-new keys only (unchanged keys
        // must NOT get a duplicate current row — idempotence)
        val c2 = cur.select(
          key.map(col) ++ attrs.map(c => col(c).as(s"__c_$c")) :+ lit(true).as("__c_present"): _*)
        val toOpen = batch.join(c2, key, "left")
          .filter(col("__c_present").isNull ||
            attrs.map(c => !(col(c) <=> col(s"__c_$c"))).reduce(_ || _))
          .select((key ++ attrs).map(col): _*)
          .withColumn("effective_from", lit(asOf))
          .withColumn("effective_to", lit(null).cast("date"))
        hist.unionByName(kept).unionByName(closed).unionByName(toOpen)
    }
  }

  /** The current slice: one row per key, today's truth. */
  def current(dim: DataFrame): DataFrame = dim.filter(col("effective_to").isNull)

  /** The version of each key valid at `at` — half-open interval
    * `[effective_from, effective_to)`. */
  def asOf(dim: DataFrame, at: java.sql.Date): DataFrame =
    dim.filter(col("effective_from") <= lit(at) &&
      (col("effective_to").isNull || col("effective_to") > lit(at)))
}
