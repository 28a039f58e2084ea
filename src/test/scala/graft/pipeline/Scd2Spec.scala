package graft.pipeline

import java.sql.Date

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val d1 = Date.valueOf("2024-01-01")
  private val d2 = Date.valueOf("2024-02-01")
  private val d3 = Date.valueOf("2024-03-01")

  private def rows(dim: DataFrame): Set[(String, String, Date, Option[Date])] =
    dim.collect().map(r => (
      r.getAs[String]("code"), r.getAs[String]("name"),
      r.getAs[Date]("effective_from"), Option(r.getAs[Date]("effective_to")))).toSet

  test("initial load opens one current row per key") {
    val dim = Scd2(None, Seq(("AA", "American"), ("DL", "Delta")).toDF("code", "name"),
      Seq("code"), Seq("name"), d1)
    assert(rows(dim) === Set(
      ("AA", "American", d1, None), ("DL", "Delta", d1, None)))
  }

  test("changed key closes old version and opens new; unchanged/absent keys untouched") {
    val v1 = Scd2(None,
      Seq(("AA", "American"), ("DL", "Delta"), ("UA", "United")).toDF("code", "name"),
      Seq("code"), Seq("name"), d1)
    // batch mentions AA (changed) and DL (unchanged); UA absent
    val v2 = Scd2(Some(v1),
      Seq(("AA", "American Airlines"), ("DL", "Delta")).toDF("code", "name"),
      Seq("code"), Seq("name"), d2)
    assert(rows(v2) === Set(
      ("AA", "American", d1, Some(d2)),          // closed
      ("AA", "American Airlines", d2, None),      // new current
      ("DL", "Delta", d1, None),                  // unchanged
      ("UA", "United", d1, None)))                // absent from batch → open

    // history survives a further change, and a brand-new key opens
    val v3 = Scd2(Some(v2),
      Seq(("AA", "AA Group"), ("B6", "JetBlue")).toDF("code", "name"),
      Seq("code"), Seq("name"), d3)
    assert(rows(v3) === Set(
      ("AA", "American", d1, Some(d2)),
      ("AA", "American Airlines", d2, Some(d3)),
      ("AA", "AA Group", d3, None),
      ("DL", "Delta", d1, None),
      ("UA", "United", d1, None),
      ("B6", "JetBlue", d3, None)))
  }

  test("re-applying the same batch is a no-op (idempotent)") {
    val batch = Seq(("AA", "American"), ("DL", "Delta")).toDF("code", "name")
    val v1 = Scd2(None, batch, Seq("code"), Seq("name"), d1)
    val v2 = Scd2(Some(v1), batch, Seq("code"), Seq("name"), d2)
    assert(rows(v2) === rows(v1))
    // null attribute values compare null-safely: still a no-op
    val nb = Seq(("AA", Option.empty[String])).toDF("code", "name")
    val n1 = Scd2(None, nb, Seq("code"), Seq("name"), d1)
    val n2 = Scd2(Some(n1), nb, Seq("code"), Seq("name"), d2)
    assert(rows(n2) === rows(n1))
  }

  test("current and asOf slices reconstruct point-in-time truth") {
    val v1 = Scd2(None, Seq(("AA", "American")).toDF("code", "name"),
      Seq("code"), Seq("name"), d1)
    val v2 = Scd2(Some(v1), Seq(("AA", "American Airlines")).toDF("code", "name"),
      Seq("code"), Seq("name"), d2)

    assert(Scd2.current(v2).select("name").as[String].collect().toSeq ===
      Seq("American Airlines"))
    // at d1 (and any instant before d2) the old name was truth
    assert(Scd2.asOf(v2, d1).select("name").as[String].collect().toSeq ===
      Seq("American"))
    assert(Scd2.asOf(v2, Date.valueOf("2024-01-15")).select("name").as[String]
      .collect().toSeq === Seq("American"))
    // the half-open interval: at exactly d2 the NEW version is truth
    assert(Scd2.asOf(v2, d2).select("name").as[String].collect().toSeq ===
      Seq("American Airlines"))
    // before the dim existed: empty
    assert(Scd2.asOf(v2, Date.valueOf("2023-12-31")).isEmpty)
  }

  test("point-in-time fact enrichment = native as-of join on effective_from") {
    val v1 = Scd2(None, Seq(("AA", "American"), ("DL", "Delta")).toDF("code", "name"),
      Seq("code"), Seq("name"), d1)
    val v2 = Scd2(Some(v1), Seq(("AA", "American Airlines")).toDF("code", "name"),
      Seq("code"), Seq("name"), d2)

    val facts = Seq(
      (1L, "AA", Date.valueOf("2024-01-15")), // old name era
      (2L, "AA", Date.valueOf("2024-02-15")), // new name era
      (3L, "DL", Date.valueOf("2024-03-01")),
      (4L, "AA", Date.valueOf("2023-12-15"))) // before the dim existed
      .toDF("fact_id", "code", "fact_date")

    // the 100 TB path: the fact side is NEVER shuffled — the dim (all
    // versions, tiny) broadcasts and each fact row binary-searches the
    // version whose effective_from is the latest at-or-before its date.
    // Valid because versions of a key never overlap: latest
    // effective_from <= d IS the row whose interval contains d (or a
    // closed row only when d predates nothing newer — facts after the
    // last close can't occur since closing always opens a successor).
    val enriched = graft.plans.AsOf.join(
        facts, broadcast(v2.select(col("code"), col("name"), col("effective_from"))),
        Seq("code"), "fact_date", "effective_from")
      .select(col("fact_id"), col("name"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    assert(enriched === Map(
      1L -> Some("American"),
      2L -> Some("American Airlines"),
      3L -> Some("Delta"),
      4L -> None))

    // agrees with the per-date Scd2.asOf slice
    facts.collect().foreach { r =>
      val hit = Scd2.asOf(v2, r.getAs[Date]("fact_date"))
        .filter(col("code") === r.getAs[String]("code"))
        .select("name").as[String].collect().headOption
      assert(enriched(r.getAs[Long]("fact_id")) === hit,
        s"fact ${r.getAs[Long]("fact_id")}")
    }
  }
}
