package graft.plans

import graft.SparkSpec
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The license for swapping native vector expressions into every ANN/dedup
  * query without re-baselining hashes: bit-exact equivalence (via
  * `doubleToLongBits`, so NaN and -0.0 count) between the native kernels
  * and the interpreted HOF reference forms, across float/double element
  * types, degenerate shapes (empty, length mismatch, null elements, null
  * arrays, zero vectors, NaN), and both codegen and interpreted paths. */
class VectorExprsSpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)
  private def fvec(n: Int): Seq[java.lang.Float] =
    Seq.fill(n)(java.lang.Float.valueOf((rnd.nextFloat() - 0.5f) * 10f))

  /** Rows of (a, b) float vectors covering the degenerate shapes.
    * lazy val: the codegen-vs-interpreted test selects from it twice and
    * must see the SAME sampled data both times. */
  private lazy val floatPairs: DataFrame = {
    val pairs: Seq[(Seq[java.lang.Float], Seq[java.lang.Float])] =
      Seq.fill(40)((fvec(64), fvec(64))) ++ Seq(
        (fvec(8), fvec(8)),
        (Seq.empty, Seq.empty),                       // empty: dot 0, cosine null (0-denom)
        (fvec(8), fvec(5)),                           // length mismatch -> null
        (fvec(8), fvec(8).updated(3, null)),          // null element -> null
        (Seq.fill(8)(java.lang.Float.valueOf(0f)), fvec(8)), // zero vector -> 0 denom -> null
        (fvec(8), fvec(8).updated(0, java.lang.Float.valueOf(Float.NaN))), // NaN propagates
        (null, fvec(8)),                              // null array -> null
        (fvec(8), null))
    val rows = pairs.map { case (a, b) => Row(a, b) }
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true), nullable = true),
      StructField("b", ArrayType(FloatType, containsNull = true), nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  /** Mixed element types: float embedding vs double centroid (the
    * ivfAssigned shape). */
  private lazy val mixedPairs: DataFrame = {
    val rows = Seq.fill(20)(Row(fvec(16), fvec(16).map(f => java.lang.Double.valueOf(f.toDouble * 1.5))))
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true), nullable = true),
      StructField("b", ArrayType(DoubleType, containsNull = true), nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def bitsOrNull(r: Row, i: Int): Any =
    if (r.isNullAt(i)) null else java.lang.Double.doubleToLongBits(r.getDouble(i))

  private def assertBitEqual(df: DataFrame): Unit =
    df.collect().zipWithIndex.foreach { case (r, i) =>
      assert(bitsOrNull(r, 0) === bitsOrNull(r, 1), s"row $i: native=$r")
    }

  test("cosine: native is bit-equal to the HOF form (float, degenerate shapes)") {
    assertBitEqual(floatPairs.select(
      VectorOps.cosine(col("a"), col("b")).as("n"),
      VectorOps.cosineHof(col("a"), col("b")).as("h")))
  }

  test("dot and norm: native bit-equal to HOF") {
    assertBitEqual(floatPairs.select(
      VectorOps.dot(col("a"), col("b")).as("n"),
      VectorOps.dotHof(col("a"), col("b")).as("h")))
    assertBitEqual(floatPairs.select(
      VectorOps.norm(col("a")).as("n"),
      VectorOps.normHof(col("a")).as("h")))
  }

  test("cosine: float x double operands (embedding vs centroid) bit-equal") {
    assertBitEqual(mixedPairs.select(
      VectorOps.cosine(col("a"), col("b")).as("n"),
      VectorOps.cosineHof(col("a"), col("b")).as("h")))
  }

  test("hyperplaneBucket: native equals HOF, and degenerate inputs bucket to 0") {
    val rows = floatPairs.select(
      VectorOps.hyperplaneBucket(col("a"), planes = 8, dim = 64).as("n"),
      VectorOps.hyperplaneBucketHof(col("a"), planes = 8, dim = 64).as("h")).collect()
    rows.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1)) // both forms are non-nullable
      assert(r.getLong(0) === r.getLong(1), s"bucket mismatch: $r")
    }
    // the 8-dim / null / empty rows all have length != 64 -> bucket 0 in both
    assert(rows.count(_.getLong(0) == 0L) >= 7)
  }

  test("survives both codegen and interpreted evaluation paths") {
    def run(mode: String): Seq[Any] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try floatPairs.select(
        VectorOps.cosine(col("a"), col("b")).as("c"),
        VectorOps.hyperplaneBucket(col("a"), 4, 64).as("bk")).collect()
        .map(r => (bitsOrNull(r, 0), r.getLong(1))).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("registered as SQL functions via GraftExtensions") {
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vector_norm(array(3.0D, 4.0D)) AS nm,
        |       hyperplane_bucket(array(1.0D, -1.0D, 0.5D, 2.0D), 4, 4) AS bk
        |""".stripMargin).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 11.0)
    assert(r.getDouble(2) === 5.0)
    assert(r.getLong(3) >= 0 && r.getLong(3) < 16)
  }

  test("int_dot_product: exact int64 math, null on mismatch/null element") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),   // 4+10+18 = 32
      (Seq(255L, 255L), Seq(255L, 255L)))   // uint8 max: 130050
      .toDF("a", "b")
    val got = df.select(VectorOps.intDot(col("a"), col("b"))).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(32L, 130050L))

    // length mismatch → null; null element → null; SQL registration works
    val r = spark.sql(
      """SELECT int_dot_product(array(1L, 2L), array(1L)) AS mismatch,
        |       int_dot_product(array(1L, CAST(NULL AS BIGINT)), array(1L, 1L)) AS nullelem,
        |       int_dot_product(array(2L, 3L), array(5L, 7L)) AS ok""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getLong(2) === 31L)
  }
}
