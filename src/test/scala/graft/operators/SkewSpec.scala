package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin returns exactly the plain join's rows on skewed data") {
    // 90% of the big side shares one hot key
    val big = spark.range(0, 5000)
      .select(col("id"), when(col("id") % 10 < 9, lit(7)).otherwise(col("id") % 100).as("k"))
    val small = spark.range(0, 100).select(col("id").as("k"), concat(lit("v"), col("id")).as("v"))

    val plain = big.join(small, "k").select("id", "v")
    val salted = Skew.saltedJoin(big, small, "k", salt = 8).select("id", "v")

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
