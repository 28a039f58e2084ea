package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.PartitionedTable
import org.apache.spark.sql.functions._

/** Atomic staged DDL (StagingTableCatalog): CREATE/REPLACE ... AS
  * SELECT land through GraftStagedTable — a failed CTAS leaves no
  * table, a REPLACE commits the new snapshot on the SAME manifest log
  * (one atomic manifest rename; time travel keeps the pre-replace
  * snapshots), and changing the partitioning on replace is refused
  * with direction. Without staging, Spark's fallback is DROP then
  * CREATE — a failed CTAS would destroy the old table. */
class GraftStagedDdlSpec extends SparkSpec {

  private def ensureCatalog(): Unit =
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft",
        classOf[GraftCatalog].getName)

  test("REPLACE TABLE AS SELECT commits on the same manifest log: one new version, history and time travel intact") {
    ensureCatalog()
    val base = Files.createTempDirectory("graftstage").toString
    spark.sql(
      s"""CREATE TABLE graft.stg.t PARTITIONED BY (part) LOCATION '$base/t'
         |AS SELECT id AS k, concat('p', cast(id % 2 AS string)) AS part,
         |          id * 10 AS v
         |FROM range(10)""".stripMargin) // v0 via staged CTAS
    val dir = s"$base/t"
    assert(PartitionedTable.latest(spark, dir).get === 0L)

    spark.sql(
      s"""REPLACE TABLE graft.stg.t PARTITIONED BY (part)
         |AS SELECT id AS k, 'p0' AS part, id AS v FROM range(3)""".stripMargin)
    assert(PartitionedTable.latest(spark, dir).get === 1L,
      "REPLACE is ONE commit on the same log")
    assert(spark.sql("SELECT count(*) FROM graft.stg.t").head.getLong(0) === 3L)
    assert(spark.sql("SELECT count(*) FROM graft.stg.t VERSION AS OF 0")
      .head.getLong(0) === 10L, "pre-replace snapshot stays time-travelable")
    assert(PartitionedTable.history(spark, dir)
      .filter(col("at") === "sql_replace").count() === 1L)

    // CREATE OR REPLACE on an existing table is the replace leg
    spark.sql(
      s"""CREATE OR REPLACE TABLE graft.stg.t PARTITIONED BY (part)
         |AS SELECT id AS k, 'p1' AS part, id AS v FROM range(5)""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graft.stg.t").head.getLong(0) === 5L)
    assert(spark.sql("SELECT count(*) FROM graft.stg.t VERSION AS OF 1")
      .head.getLong(0) === 3L)

    // changing the partitioning on replace is refused with direction
    val e = intercept[Exception](spark.sql(
      s"""REPLACE TABLE graft.stg.t PARTITIONED BY (v)
         |AS SELECT 1L AS k, 'x' AS part, 2L AS v""".stripMargin))
    assert(e.getMessage.contains("DROP and re-CREATE"),
      s"got: ${e.getMessage}")
    GraftCatalog.unregister("stg", "t")
  }

  test("failure atomicity: a failed CTAS leaves no table; a failed REPLACE leaves the old snapshot as latest") {
    ensureCatalog()
    val base = Files.createTempDirectory("graftstage2").toString
    // failed CTAS: the query errors mid-write — nothing becomes visible
    intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.stg2.bad PARTITIONED BY (part)
         |LOCATION '$base/bad'
         |AS SELECT id AS k, 'p0' AS part, assert_true(id < 5) AS v
         |FROM range(10)""".stripMargin))
    assert(spark.sql("SHOW TABLES IN graft.stg2").count() === 0L,
      "failed CTAS must not leave a table behind")

    // failed REPLACE: the old table stays exactly as it was
    spark.sql(
      s"""CREATE TABLE graft.stg2.t PARTITIONED BY (part)
         |LOCATION '$base/t'
         |AS SELECT id AS k, 'p0' AS part, id AS v FROM range(4)""".stripMargin)
    intercept[Exception](spark.sql(
      s"""REPLACE TABLE graft.stg2.t PARTITIONED BY (part)
         |AS SELECT id AS k, 'p0' AS part, assert_true(id < 2) AS v
         |FROM range(10)""".stripMargin))
    assert(PartitionedTable.latest(spark, s"$base/t").get === 0L,
      "failed REPLACE must not mint a version")
    assert(spark.sql("SELECT count(*) FROM graft.stg2.t")
      .head.getLong(0) === 4L)
    GraftCatalog.unregister("stg2", "t")
  }

  test("plain REPLACE TABLE (no AS SELECT) truncates at a MATCHING schema and refuses a different one loud") {
    ensureCatalog()
    val base = Files.createTempDirectory("graftstage4").toString
    spark.sql(
      s"""CREATE TABLE graft.stg4.t PARTITIONED BY (part)
         |LOCATION '$base/t'
         |AS SELECT id AS k, 'p0' AS part, id AS v FROM range(4)""".stripMargin)
    // same declared shape: the replace is a truncate (empty new snapshot)
    spark.sql(
      s"""REPLACE TABLE graft.stg4.t (k BIGINT, part STRING, v BIGINT)
         |PARTITIONED BY (part)""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graft.stg4.t").head.getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM graft.stg4.t VERSION AS OF 0")
      .head.getLong(0) === 4L)
    // a DIFFERENT declared schema must not silently truncate under the
    // old one — fail loud with direction (footers are the schema of
    // record; a row-less replace cannot apply a new shape)
    val e = intercept[Exception](spark.sql(
      s"""REPLACE TABLE graft.stg4.t (k BIGINT, part STRING, w STRING)
         |PARTITIONED BY (part)""".stripMargin))
    assert(e.getMessage.contains("schema of record"), s"got: ${e.getMessage}")
    // nothing changed: still the truncated v1
    assert(PartitionedTable.latest(spark, s"$base/t").get === 1L)
    GraftCatalog.unregister("stg4", "t")
  }

  test("staged CTAS refuses a LOCATION holding pre-existing files (abort would destroy them)") {
    ensureCatalog()
    val base = Files.createTempDirectory("graftstage5").toString
    // unrelated pre-existing content at the target location
    Files.createDirectories(java.nio.file.Paths.get(s"$base/t"))
    Files.write(java.nio.file.Paths.get(s"$base/t/precious.txt"),
      "do not destroy".getBytes)
    val e = intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.stg5.t PARTITIONED BY (part)
         |LOCATION '$base/t'
         |AS SELECT id AS k, 'p0' AS part, id AS v FROM range(4)""".stripMargin))
    assert(e.getMessage.contains("empty or absent LOCATION"),
      s"got: ${e.getMessage}")
    // the pre-existing file survived the refused stage
    assert(Files.exists(java.nio.file.Paths.get(s"$base/t/precious.txt")))
    assert(spark.sql("SHOW TABLES IN graft.stg5").count() === 0L)
  }

  test("REPLACE with an empty query truncates: the new snapshot is empty, schema-bearing") {
    ensureCatalog()
    val base = Files.createTempDirectory("graftstage3").toString
    spark.sql(
      s"""CREATE TABLE graft.stg3.t PARTITIONED BY (part)
         |LOCATION '$base/t'
         |AS SELECT id AS k, 'p0' AS part, id AS v FROM range(4)""".stripMargin)
    spark.sql(
      s"""REPLACE TABLE graft.stg3.t PARTITIONED BY (part)
         |AS SELECT id AS k, 'p0' AS part, id AS v FROM range(0)""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graft.stg3.t").head.getLong(0) === 0L)
    assert(spark.sql("SELECT * FROM graft.stg3.t").columns.toSeq
      === Seq("k", "part", "v"))
    assert(spark.sql("SELECT count(*) FROM graft.stg3.t VERSION AS OF 0")
      .head.getLong(0) === 4L)
    GraftCatalog.unregister("stg3", "t")
  }
}
