package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber equals the naive global window under any partition layout") {
    // keys with heavy duplication in the sort prefix so range boundaries
    // split equal-prefix runs across partitions — the tiebreak column
    // must keep the rank total and exact
    val rows = (1 to 257).map(i => (i.toLong, (i % 7).toLong))
    for (parts <- Seq(1, 3, 13)) {
      val df = rows.toDF("id", "grp").repartition(parts)
      val (ranked, n) = Ranks.globalRowNumber(df, "rn", col("grp").desc, col("id"))
      assert(n === 257L)
      val got = ranked.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val expected = rows.sortBy { case (id, grp) => (-grp, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
      assert(got === expected, s"parts=$parts")
    }
  }

  test("globalRowNumber on an empty frame returns an empty frame and n=0") {
    val df = Seq.empty[(Long, Long)].toDF("id", "grp")
    val (ranked, n) = Ranks.globalRowNumber(df, "rn", col("id"))
    assert(n === 0L)
    assert(ranked.count() === 0L)
  }

  test("globalRunningSum equals the naive exclusive prefix sum under any partition layout") {
    // values vary in magnitude so a subtotal/offset mix-up shows up
    // immediately; duplicated sort prefixes exercise the tiebreak
    val rows = (1 to 211).map(i => (i.toLong, ((i * 31) % 97 + 1).toLong))
    val expected = {
      val sorted = rows.sortBy(_._1)
      sorted.map(_._1).zip(sorted.map(_._2).scanLeft(0L)(_ + _).init).toMap
    }
    for (parts <- Seq(1, 4, 17)) {
      val df = rows.toDF("id", "v").repartition(parts)
      val cum = Ranks.globalRunningSum(df, "run", col("v"), col("id"))
      val got = cum.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === expected, s"parts=$parts")
    }
  }

  test("globalRunningSum on an empty frame returns the zero column") {
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(Ranks.globalRunningSum(df, "run", col("v"), col("id")).count() === 0L)
  }

  test("globalRunningSum degrades predictably when a partition's values are all NULL") {
    // a sort range whose rows all carry NULL used to NPE in the driver's
    // subtotal read; NULLs must contribute 0 and not poison the offsets
    val rows = (1 to 60).map(i => (i.toLong, if (i <= 20) None else Some(i.toLong)))
    val df = rows.toDF("id", "v").repartition(5)
    val cum = Ranks.globalRunningSum(df, "run", col("v"), col("id"))
    val got = cum.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expected = {
      val sorted = rows.sortBy(_._1)
      sorted.map(_._1).zip(
        sorted.map(_._2.getOrElse(0L)).scanLeft(0L)(_ + _).init).toMap
    }
    assert(got === expected)
  }
}
