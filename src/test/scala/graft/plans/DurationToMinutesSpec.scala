package graft.plans

import graft.SparkSpec
import graft.functions.Exprs
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class DurationToMinutesSpec extends SparkSpec {
  import spark.implicits._

  private val inputs = Seq(
    "PT2H30M", "PT45M", "PT11H", "PT3H", "PT0M", "PT", "2h30m", "", null,
    "PTXM", "PT1H2M3S", "PT999999999999H", "PT10H59M")

  test("native expression matches the composed Column form on edge cases") {
    val df = inputs.map(Tuple1(_)).toDF("d")
    val both = df.select(
      DurationToMinutes(col("d")).as("native"),
      Exprs.durationToMinutes(col("d")).as("composed")).collect()
    both.zip(inputs).foreach { case (r, in) =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch for '$in': $r")
      if (!r.isNullAt(0)) assert(r.getInt(0) === r.getInt(1), s"value mismatch for '$in'")
    }
  }

  test("native expression equivalence on generated durations (property)") {
    val dGen = Gen.oneOf(
      for { h <- Gen.choose(0, 99); m <- Gen.choose(0, 99) } yield s"PT${h}H${m}M",
      Gen.choose(0, 999).map(m => s"PT${m}M"),
      Gen.choose(0, 99).map(h => s"PT${h}H"),
      Gen.alphaNumStr)
    val prop = Prop.forAll(Gen.listOfN(50, dGen)) { ins =>
      val rows = ins.map(Tuple1(_)).toDF("d").select(
        DurationToMinutes(col("d")).as("n"),
        Exprs.durationToMinutes(col("d")).as("c")).collect()
      rows.forall(r =>
        r.isNullAt(0) == r.isNullAt(1) && (r.isNullAt(0) || r.getInt(0) == r.getInt(1)))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("registered as a SQL function via GraftExtensions") {
    val out = spark.sql("SELECT duration_to_minutes('PT2H5M') AS m").head().getInt(0)
    assert(out === 125)
  }

  test("survives both codegen and interpreted evaluation paths") {
    val df = inputs.map(Tuple1(_)).toDF("d")
    def run(mode: String): Seq[Any] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(DurationToMinutes(col("d")).as("m")).collect()
        .map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }
}
