package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Predicate-shaped MERGE INTO: Delta clause semantics (in-order,
  * first-match-wins, untouched no-op rows), unnamed UPDATE columns keep
  * target values, the landing touches only the source's partitions, and
  * an all-no-op merge never forges a table version. */
class MergeIntoSpec extends SparkSpec {

  private def freshStore(): String =
    Files.createTempDirectory("mergeinto").toString + "/t"

  private def table(n: Int) = spark.range(n).select(
    col("id").as("k"),
    concat(lit("p"), (col("id") % 4).cast("string")).as("part"),
    (col("id") * 10).as("v"),
    concat(lit("tag"), col("id")).as("tag"))

  test("clause order decides: update-then-delete vs delete-then-update differ exactly as Delta's would") {
    import spark.implicits._
    val a = freshStore(); val b = freshStore()
    Seq(a, b).foreach(d => PartitionedTable.commit(spark, d, table(100), "part"))
    // source: keys 4,8,12 in p0 — v = 40, 80, 120
    val src = Seq((4L, "p0"), (8L, "p0"), (12L, "p0")).toDF("k", "part")

    // update-where-v>50 first, else delete
    MergeInto(spark, a, src, "k", "part",
      matched = Seq(
        MergeInto.updateWhen(col("tgt.v") > 50, Map("v" -> (col("tgt.v") + 1))),
        MergeInto.delete))
    val ra = PartitionedTable.read(spark, a).filter(col("k").isin(4L, 8L, 12L))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ra === Map(8L -> 81L, 12L -> 121L), "k=4 (v=40) deletes; others bump")

    // delete first (unconditional) shadows the update entirely
    MergeInto(spark, b, src, "k", "part",
      matched = Seq(
        MergeInto.delete,
        MergeInto.update(Map("v" -> (col("tgt.v") + 1)))))
    assert(PartitionedTable.read(spark, b)
      .filter(col("k").isin(4L, 8L, 12L)).count() === 0,
      "the first clause wins: every matched row deletes")
  }

  test("UPDATE SET keeps unnamed columns; unmatched-by-any-clause rows stay untouched; inserts honor their condition") {
    import spark.implicits._
    val dir = freshStore()
    PartitionedTable.commit(spark, dir, table(100), "part")
    val src = Seq(
      (4L, "p0", 7L),    // matched, cond holds → update
      (8L, "p0", -1L),   // matched, cond fails → NO clause → untouched
      (401L, "p1", 5L),  // not matched, insert cond holds
      (402L, "p2", -5L)  // not matched, insert cond fails → dropped
    ).toDF("k", "part", "w")
    val v = MergeInto(spark, dir, src, "k", "part",
      matched = Seq(MergeInto.updateWhen(col("src.w") > 0,
        Map("v" -> (col("tgt.v") + col("src.w"))))),
      notMatched = Some(MergeInto.NotMatched(Some(col("src.w") > 0),
        Map("v" -> lit(999L), "tag" -> lit("inserted")))))
    val byK = PartitionedTable.read(spark, dir)
      .filter(col("k").isin(4L, 8L, 401L, 402L))
      .select("k", "v", "tag").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getString(2)))).toMap
    assert(byK(4L) === ((47L, "tag4")), "update bumps v, KEEPS the unnamed tag")
    assert(byK(8L) === ((80L, "tag8")), "no accepting clause = untouched")
    assert(byK(401L) === ((999L, "inserted")), "conditional insert lands")
    assert(!byK.contains(402L), "failed insert condition drops the row")
    assert(v === 1L)
  }

  test("the landing touches only the source's partitions; insert into an absent partition creates it; all-no-op mints no version") {
    import spark.implicits._
    val dir = freshStore()
    PartitionedTable.commit(spark, dir, table(100), "part")
    val v0 = PartitionedTable.latest(spark, dir).get
    val src = Seq((4L, "p0", 1L), (500L, "p9", 1L)).toDF("k", "part", "w")
    MergeInto(spark, dir, src, "k", "part",
      matched = Seq(MergeInto.update(Map("v" -> lit(0L)))),
      notMatched = Some(MergeInto.NotMatched(None,
        Map("v" -> lit(5L), "tag" -> lit("new")))))
    // history pins the touch scope: exactly p0 (update) + p9 (created)
    val hist = PartitionedTable.history(spark, dir)
      .orderBy(desc("version")).select("at", "touched").head
    assert(hist.getString(0) === "merge_into" && hist.getLong(1) === 2L,
      s"expected 2 touched partitions tagged merge_into, got $hist")
    assert(PartitionedTable.partitionValues(spark, dir).contains("p9"))
    // untouched partitions' store pointers carried over byte-identically
    val v1 = PartitionedTable.latest(spark, dir).get
    val (m0, m1) = (PartitionedTable.manifest(spark, dir, v0),
      PartitionedTable.manifest(spark, dir, v1))
    Seq("p1", "p2", "p3").foreach { p =>
      val key = m0.keys.find(_.endsWith(s"=$p")).get
      assert(m1(key) === m0(key), s"$p must carry over unrewritten")
    }

    // a merge where no clause accepts anything: same version, no commit
    val noop = Seq((8L, "p0", -1L)).toDF("k", "part", "w")
    val vSame = MergeInto(spark, dir, noop, "k", "part",
      matched = Seq(MergeInto.updateWhen(col("src.w") > 0,
        Map("v" -> lit(1L)))))
    assert(vSame === v1 && PartitionedTable.latest(spark, dir).get === v1,
      "an all-no-op MERGE must not forge a table version")
  }

  test("assigning the key or partition column in UPDATE SET is refused loud") {
    import spark.implicits._
    val dir = freshStore()
    PartitionedTable.commit(spark, dir, table(20), "part")
    val src = Seq((4L, "p0")).toDF("k", "part")
    val ex = intercept[IllegalArgumentException] {
      MergeInto(spark, dir, src, "k", "part",
        matched = Seq(MergeInto.update(Map("part" -> lit("p9")))))
    }
    assert(ex.getMessage.contains("DELETE + INSERT"))
  }

  test("a concurrent commit to a touched partition re-derives the merge: tgt-derived values come from the NEW snapshot") {
    import spark.implicits._
    val dir = freshStore()
    PartitionedTable.commit(spark, dir, table(100), "part") // k=4: v=40
    // between MergeInto's snapshot and its landing, a racing writer
    // moves k=4 to v=5 — re-applying the frozen +1000 would land 1040
    // and silently erase the racer (the r13 ADVICE lost-update)
    var fired = 0
    MergeInto.afterSnapshotHook = () => {
      if (fired == 0) {
        fired += 1
        PartitionedTable.merge(spark, dir,
          Seq((4L, "p0", 5L, "tag4", "upsert"))
            .toDF("k", "part", "v", "tag", "op"), "k", "part")
      }
    }
    try {
      val src = Seq((4L, "p0"), (8L, "p0")).toDF("k", "part")
      MergeInto(spark, dir, src, "k", "part",
        matched = Seq(MergeInto.update(Map("v" -> (col("tgt.v") + 1000)))))
    } finally MergeInto.afterSnapshotHook = () => ()
    assert(fired === 1, "the hook must fire exactly once (attempt 1)")
    val got = PartitionedTable.read(spark, dir)
      .filter(col("k").isin(4L, 8L)).select("k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(4L -> 1005L, 8L -> 1080L),
      "the retry must re-derive from the racer's snapshot (5+1000), " +
        s"not re-apply the stale 40+1000; got $got")
  }

  test("a concurrent commit to a DISJOINT partition does not conflict: the first attempt lands by rebase") {
    import spark.implicits._
    val dir = freshStore()
    PartitionedTable.commit(spark, dir, table(100), "part")
    var fired = 0
    MergeInto.afterSnapshotHook = () => {
      fired += 1
      PartitionedTable.merge(spark, dir,
        Seq((7L, "p3", 777L, "t", "upsert"))
          .toDF("k", "part", "v", "tag", "op"), "k", "part")
    }
    try {
      val src = Seq((4L, "p0")).toDF("k", "part")
      MergeInto(spark, dir, src, "k", "part",
        matched = Seq(MergeInto.update(Map("v" -> (col("tgt.v") + 1000)))))
    } finally MergeInto.afterSnapshotHook = () => ()
    assert(fired === 1, "a disjoint racer must not force a re-derive")
    val got = PartitionedTable.read(spark, dir)
      .filter(col("k").isin(4L, 7L)).select("k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(4L -> 1040L, 7L -> 777L),
      "both writes must survive: the merge rebases past the disjoint winner")
  }

  test("the snapshot-pinned merge primitive fails loud when a touched partition moved since the pin") {
    import spark.implicits._
    val dir = freshStore()
    PartitionedTable.commit(spark, dir, table(40), "part") // v0
    PartitionedTable.merge(spark, dir,
      Seq((4L, "p0", 5L, "t", "upsert")).toDF("k", "part", "v", "tag", "op"),
      "k", "part") // v1 moved p0
    val stale = Seq((8L, "p0", 9L, "t", "upsert"))
      .toDF("k", "part", "v", "tag", "op")
    val ex = intercept[PartitionedTable.ConcurrentWriteException] {
      PartitionedTable.merge(spark, dir, stale, "k", "part",
        sinceVersion = Some(0L))
    }
    assert(ex.getMessage.contains("moved since snapshot v=0"))
    // pinned at the CURRENT version it lands fine
    PartitionedTable.merge(spark, dir, stale, "k", "part",
      sinceVersion = Some(1L))
    assert(PartitionedTable.read(spark, dir).filter(col("k") === 8L)
      .select("v").head().getLong(0) === 9L)
  }
}
