package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The expectations gate: fail-closed on NULL, exact per-rule tagging
  * (a row failing two rules carries both names), and a split that
  * neither loses nor duplicates a row.
  */
class ExpectationsSpec extends SparkSpec {

  test("split is exact: fail-closed nulls, multi-rule tags, partition of the input") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(5L)), // passes both
      (2L, Some(-3L)), // fails pos
      (3L, Some(500L)), // fails small
      (4L, Some(-200L)), // fails pos (and passes small: -200 < 100)
      (5L, None) // NULL: the only way to fail both, fail-closed
    ).toDF("id", "x")
    val rules = Seq(
      "pos" -> (col("x") > 0),
      "small" -> (col("x") < lit(100)))
    val (clean, dirty) = Expectations.split(df, rules)

    assert(clean.select("id").collect().map(_.getLong(0)).toSet === Set(1L))
    val tags = dirty.select("id", "violated").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(tags === Map(
      2L -> Set("pos"), 3L -> Set("small"),
      4L -> Set("pos"), 5L -> Set("pos", "small")))
    assert(clean.count() + dirty.count() === df.count(), "split partitions the input")

    val counts = Expectations.violationCounts(dirty).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("pos" -> 3L, "small" -> 2L),
      "the null row's double-failure counts once under each rule")

    val dup = intercept[IllegalArgumentException] {
      Expectations.split(df, Seq("a" -> lit(true), "a" -> lit(false)))
    }
    assert(dup.getMessage.contains("duplicate"))

    // a pre-existing 'violated' column would be silently overwritten
    // (and dropped from the clean side) — refuse it up front
    val collide = intercept[IllegalArgumentException] {
      Expectations.split(df.withColumn("violated", lit("caller data")), rules)
    }
    assert(collide.getMessage.contains("violated"))
  }
}
