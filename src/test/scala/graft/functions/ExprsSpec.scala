package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Unit + property coverage for the pure Column expression library —
  * including the helpers the silver stage depends on (U1/U2/P10/F7/F8). */
class ExprsSpec extends SparkSpec {
  import spark.implicits._

  private def minutesOf(s: Seq[String]): Seq[Option[Int]] =
    s.toDF("d").select(Exprs.durationToMinutes(col("d")).as("m"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))

  test("durationToMinutes golden semantics (reference UDF parity)") {
    assert(minutesOf(Seq("PT2H30M", "PT45M", "PT11H", "PT3H", "PT0M")) ===
      Seq(Some(150), Some(45), Some(660), Some(180), Some(0)))
  }

  test("durationToMinutes rejects garbage and propagates null") {
    val rows = Seq[(Integer, String)]((1, "2h30m"), (2, ""), (3, null), (4, "PTXM"), (5, "PT1H2M3S"))
      .toDF("id", "d").select(Exprs.durationToMinutes(col("d")).as("m")).collect()
    assert(rows.forall(_.isNullAt(0)), "non-PT#H#M inputs must all be null")
    // "PT" matches with both groups missing → 0+0, per the reference UDF's
    // missing-group semantics (transformToSilver.py:19-28).
    assert(minutesOf(Seq("PT")) === Seq(Some(0)))
  }

  test("durationToMinutes agrees with java.time.Duration on generated PT#H#M") {
    val gen = for {
      h <- Gen.option(Gen.choose(0, 23))
      m <- Gen.option(Gen.choose(0, 59))
    } yield (h, m)
    val cases = Gen.listOfN(60, gen).sample.getOrElse(Nil).distinct
    val strs = cases.map { case (h, m) =>
      "PT" + h.map(_ + "H").getOrElse("") + m.map(_ + "M").getOrElse("")
    }
    val expect = cases.map { case (h, m) =>
      if (h.isEmpty && m.isEmpty) None // "PT" — degenerate, engine-defined
      else Some(java.time.Duration.parse(
        "PT" + h.map(_ + "H").getOrElse("") + m.map(_ + "M").getOrElse("")).toMinutes.toInt)
    }
    val got = minutesOf(strs)
    strs.indices.foreach { i =>
      if (expect(i).isDefined) assert(got(i) === expect(i), s"for ${strs(i)}")
    }
  }

  test("splitPacked: null → empty array, '||' delimiter, singletons") {
    val out = Seq[(Integer, String)]((1, "a||b||c"), (2, null), (3, "solo"), (4, "x||"))
      .toDF("id", "s").select(Exprs.splitPacked(col("s")).as("a"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(out === List(List("a", "b", "c"), Nil, List("solo"), List("x", "")))
  }

  test("splitPacked ∘ mkString('||') is identity on ||-free tokens (property)") {
    val tokGen = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(s => s.nonEmpty && !s.contains("|")))
    val prop = Prop.forAll(tokGen) { toks =>
      val packed = toks.mkString("||")
      val out = Seq(packed).toDF("s").select(Exprs.splitPacked(col("s")).as("a"))
        .head().getSeq[String](0).toList
      out == toks
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("scrubIntArray: sentinels and null elements → 0, numerics cast") {
    val out = Seq(Seq("3600", "None", "null", " None ", "", null, " 72 "))
      .toDF("a").select(Exprs.scrubIntArray(col("a")).as("s"))
      .head().getSeq[Integer](0).toList
    assert(out === List(3600, 0, 0, 0, 0, 0, 72))
  }

  test("isoArrayToTs parses offset ISO strings per element") {
    val out = Seq(Seq("2022-04-17T13:40:00.000-04:00", "2022-04-17T16:02:00.000+00:00"))
      .toDF("a").select(Exprs.isoArrayToTs(col("a")).as("t"))
      .head().getSeq[java.sql.Timestamp](0)
    // -04:00 → 17:40 UTC (session TZ is UTC)
    assert(out.head.toInstant.toString === "2022-04-17T17:40:00Z")
    assert(out(1).toInstant.toString === "2022-04-17T16:02:00Z")
  }

  test("tokens/distinctTokens/wordShingles") {
    val df = Seq("  The quick  brown the QUICK ").toDF("t")
    assert(df.select(Exprs.tokens(col("t"))).head().getSeq[String](0) ===
      Seq("the", "quick", "brown", "the", "quick"))
    assert(df.select(Exprs.distinctTokens(col("t"))).head().getSeq[String](0).sorted ===
      Seq("brown", "quick", "the"))
    val sh = df.select(Exprs.wordShingles(Exprs.tokens(col("t")), 2)).head().getSeq[String](0)
    assert(sh.toSet === Set("the quick", "quick brown", "brown the"))
    // shorter than n → whole text as one shingle
    val one = Seq("word").toDF("t")
      .select(Exprs.wordShingles(Exprs.tokens(col("t")), 2)).head().getSeq[String](0)
    assert(one === Seq("word"))
  }

  test("wordShingles matches a sliding-window model on random token lists (property)") {
    val tokGen = Gen.nonEmptyListOf(
      Gen.chooseNum(97, 122).map(_.toChar).flatMap(c => Gen.choose(1, 4).map(n => c.toString * n)))
    val prop = Prop.forAll(tokGen) { toks =>
      val text = toks.mkString(" ")
      val got = Seq(text).toDF("t")
        .select(Exprs.wordShingles(Exprs.tokens(col("t")), 2)).head().getSeq[String](0)
      val model =
        if (toks.size < 2) Seq(toks.mkString(" "))
        else toks.sliding(2).map(_.mkString(" ")).toSeq.distinct
      got == model
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("wordShinglesAll keeps every span start in order, duplicates included") {
    val got = Seq("a b a b a").toDF("t")
      .select(Exprs.wordShinglesAll(Exprs.tokens(col("t")), 2)).head().getSeq[String](0)
    assert(got === Seq("a b", "b a", "a b", "b a"))
    // shorter than n → the single whole-text gram, like wordShingles
    assert(Seq("word").toDF("t")
      .select(Exprs.wordShinglesAll(Exprs.tokens(col("t")), 3)).head().getSeq[String](0)
      === Seq("word"))
    assert(Seq("  ").toDF("t")
      .select(Exprs.wordShinglesAll(Exprs.tokens(col("t")), 3)).head().getSeq[String](0)
      === Seq(""))
  }

  test("wordShinglesAll matches a non-distinct sliding-window model (property)") {
    val tokGen = Gen.nonEmptyListOf(
      Gen.chooseNum(97, 122).map(_.toChar).flatMap(c => Gen.choose(1, 4).map(n => c.toString * n)))
    val prop = Prop.forAll(tokGen) { toks =>
      val text = toks.mkString(" ")
      val got = Seq(text).toDF("t")
        .select(Exprs.wordShinglesAll(Exprs.tokens(col("t")), 3)).head().getSeq[String](0)
      val model =
        if (toks.size < 3) Seq(toks.mkString(" "))
        else toks.sliding(3).map(_.mkString(" ")).toSeq
      got == model
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("hash16 is a 16-char lowercase hex prefix of md5") {
    val Row(h: String, full: String) = Seq("abc").toDF("s")
      .select(Exprs.hash16(col("s")), md5(col("s"))).head()
    assert(h.length === 16 && full.startsWith(h))
  }
}
