package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** General-purpose temporal joins, built to avoid the two classic
  * blowups: a point-in-time (as-of) join that never expands to
  * pairs-then-filter, and a range join that banding-buckets instead of
  * cross-joining.
  *
  * The reference has no temporal joins at all; these are the operators a
  * 100 TB event store actually needs (attribute purchases to sessions,
  * join metrics to maintenance windows, …).
  */
object TemporalJoins {

  /** As-of join: for every left row, attach the latest right row with the
    * same `key` and `rightTime <= leftTime` (inclusive), or null if none.
    *
    * Single shuffle on `key` (union both sides, one window pass): work is
    * O((|L|+|R|) log) per key partition, never |L|×|R|. Right rows sort
    * before left rows on timestamp ties, so a tie matches. The matched
    * right row arrives as one struct column `asofCol` (null = no match).
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, asofCol: String = "asof"): DataFrame = {
    val lStructT = StructType(left.schema.fields)
    val rStructT = StructType(right.schema.filterNot(_.name == key).toArray)

    val l = left.select(
      col(key), col(leftTime).as("__t"),
      lit(null).cast(rStructT).as("__rval"),
      struct(left.columns.map(col): _*).as("__lrow"),
      lit(1).as("__src"))
    // Determinism: several right rows on the same (key, time) would make
    // the window's tie order run-dependent; reduce them to one row first
    // (max of the value struct — field-order comparison, deterministic).
    val r = right
      .groupBy(col(key), col(rightTime).as("__t"))
      .agg(max(struct(right.columns.filterNot(_ == key).map(col): _*)).as("__rval"))
      .select(col(key), col("__t"), col("__rval"),
        lit(null).cast(lStructT).as("__lrow"),
        lit(0).as("__src"))

    val w = Window.partitionBy(key).orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lCols = left.columns.map(c => col(s"__lrow.$c").as(c))
    l.unionByName(r)
      .withColumn(asofCol, last(col("__rval"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(lCols :+ col(asofCol): _*)
  }

  /** An interval spanning more than this many buckets is dropped from the
    * banding join (and surfaced via the `range_join_guard` observe
    * metric). Same contract style as `Dedup.MaxBucketSize`: a degenerate
    * input (one interval covering the whole timeline with a fine
    * `bucketWidth`) would otherwise explode into span/bucketWidth rows —
    * unbounded amplification from a single row. Callers joining genuinely
    * huge intervals should raise `bucketWidth` (buckets near the typical
    * interval length keep amplification ~1-2×), or raise the cap
    * explicitly. */
  val MaxBucketsPerInterval: Long = 4096L

  /** Range join: pair every point with every interval (same `key`) that
    * contains it (`start <= point < end`), via banding: intervals explode
    * into the fixed-width buckets they overlap, points hash to their one
    * bucket, and the join runs on (key, bucket) + a residual predicate.
    * Work scales with actual overlaps (× interval span / bucketWidth),
    * not |points| × |intervals|. Pick `bucketWidth` near the typical
    * interval length.
    *
    * Guard contract: intervals spanning more than `maxBucketsPerInterval`
    * buckets are DROPPED (not exploded), with the drop and the total
    * banding expansion observable on the result's `range_join_guard`
    * metric (`intervals_over_cap`, `exploded_rows`). Empty intervals
    * (`end <= start`) match nothing by definition and are skipped
    * before the explode. */
  def rangeJoin(
      points: DataFrame, intervals: DataFrame, key: String,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Long = MaxBucketsPerInterval): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val p = points.withColumn("__b", floor(col(pointCol) / bucketWidth))
    // end is exclusive: a bucket is covered only if start of the bucket
    // < end, i.e. last bucket = floor((end-1)/width)
    val lastB = floor((col(endCol) - 1) / bucketWidth)
    val firstB = floor(col(startCol) / bucketWidth)
    val i = intervals
      .withColumn("__nb",
        when(col(endCol) > col(startCol), lastB - firstB + 1).otherwise(lit(0L)))
      .observe("range_join_guard",
        coalesce(sum(when(col("__nb") > maxBucketsPerInterval, 1L).otherwise(0L)),
          lit(0L)).as("intervals_over_cap"),
        coalesce(sum(when(col("__nb").between(1L, maxBucketsPerInterval), col("__nb"))),
          lit(0L)).as("exploded_rows"),
        coalesce(max(col("__nb")), lit(0L)).as("max_interval_buckets"))
      .filter(col("__nb").between(1L, maxBucketsPerInterval))
      .withColumn("__b", explode(sequence(firstB, lastB)))
      .drop("__nb")
    p.join(i, Seq(key, "__b"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__b")
  }
}
