package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering (Z-order) — the data-skipping layout for
  * tables queried by MORE than one selective dimension.
  *
  * A range layout on one key prunes only that key: every file still spans
  * the full range of every other column, so a second predicate reads the
  * whole candidate set. Interleaving the bits of two keys into one sort
  * value makes file/row-group min-max ranges tight in BOTH dimensions at
  * once — a 2-D box query then intersects only the files whose Z-range
  * crosses the box, and parquet footer stats (which Spark's reader
  * evaluates per row group, and table formats evaluate per file) skip the
  * rest. The layout is paid once at write time, like [[Bucketing]]; every
  * subsequent multi-dimension scan benefits.
  *
  * The interleave is plain codegen'd bit arithmetic — no UDF, no custom
  * expression needed; it whole-stage-codegens inside the write job's
  * range partitioner.
  *
  * Skew caveat (the 100 TB note): bit-interleaving assumes both keys are
  * roughly uniform over [0, 2^bits). Heavily skewed or unbounded domains
  * should first be mapped to rank space (quantile index via
  * `approxQuantile`-derived bin edges, a broadcast-sized array) so each
  * bit carries information; otherwise the curve degenerates toward a
  * single-key sort.
  */
object ZOrder {

  /** Z-value of two non-negative integral columns: bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1. Columns must fit in `bits` bits
    * (values are truncated above that, which only loosens — never breaks —
    * the clustering). 2*bits must stay ≤ 63. */
  def zvalue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Z-value with each dimension first scaled from [0, max] onto the full
    * [0, 2^bits) range. Interleaving only works when the two keys occupy
    * comparable bit widths — otherwise the wider key's high bits dominate
    * the curve and it degenerates toward a single-key sort (an 11-bit key
    * interleaved with a 7-bit key is partkey-sorted at every granularity
    * coarser than 2^14). This is the uniform-domain special case of
    * rank-space mapping; skewed domains should quantile-bin instead.
    * Requires max < 2^(63-bits) (no overflow of the scale multiply). */
  def zvalueScaled(a: Column, aMax: Long, b: Column, bMax: Long, bits: Int = 16): Column = {
    require(aMax > 0 && aMax < (1L << (63 - bits)),
      s"aMax=$aMax would overflow the scale multiply at bits=$bits")
    require(bMax > 0 && bMax < (1L << (63 - bits)),
      s"bMax=$bMax would overflow the scale multiply at bits=$bits")
    zvalue(a.cast("long") * (1L << bits) / (aMax + 1),
      b.cast("long") * (1L << bits) / (bMax + 1), bits)
  }

  /** Z-value over RANK space: each dimension is first mapped to its
    * quantile bin (edges computed here, once, driver-side — a 2^bits
    * array, broadcast-free since it rides codegen as a reference), so
    * skewed or unbounded domains fill the curve uniformly by MASS, not
    * by value. This is the production form for real keys; use
    * [[zvalueScaled]] only for known-uniform domains. `relErr` is
    * `approxQuantile`'s bound — edges need only be approximately even
    * for clustering to work. */
  def zvalueRanked(
      df: DataFrame, c1: String, c2: String, bits: Int = 8,
      relErr: Double = 0.001): Column = {
    require(bits >= 1 && bits <= 15, s"bits must be in [1,15], got $bits")
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    // one pass for both columns' edges — the multi-column overload scans
    // df once, not once per dimension
    val Array(e1, e2) = df.stat
      .approxQuantile(Array(c1, c2), probs, relErr).map(_.toIndexedSeq)
    zvalue(graft.plans.QuantileBucket(col(c1), e1),
      graft.plans.QuantileBucket(col(c2), e2), bits)
  }

  /** Write `df` clustered by `cluster`: range-partition into `numFiles`
    * files on the cluster value and sort within each, so per-file min-max
    * ranges are tight and non-overlapping along the cluster order. With
    * `cluster = zvalue(a, b)` that means tight in both `a` and `b`. */
  def writeClustered(df: DataFrame, cluster: Column, path: String, numFiles: Int): Unit =
    df.repartitionByRange(numFiles, cluster)
      .sortWithinPartitions(cluster)
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max of two columns for a written layout — the same
    * stats a footer-pruning reader consults. Small result (one row per
    * file); used by the skipping audit below and by tests. */
  def fileStats(df: DataFrame, c1: String, c2: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(c1).as("min1"), max(c1).as("max1"),
        min(c2).as("min2"), max(c2).as("max2"))

  /** How many files of a layout a 2-D box query must touch, judged by
    * exactly the min-max overlap test a stats-based reader applies. The
    * count is the layout's quality metric: lower = more skipping. */
  def candidateFiles(
      stats: DataFrame,
      lo1: Long, hi1: Long, lo2: Long, hi2: Long): Long =
    stats.filter(
      col("max1") >= lo1 && col("min1") <= hi1 &&
        col("max2") >= lo2 && col("min2") <= hi2)
      .count()
}
