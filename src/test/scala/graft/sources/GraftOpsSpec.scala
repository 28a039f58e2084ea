package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.PartitionedTable
import org.apache.spark.sql.functions._

/** The SQL ops surface landed in round 14: partition management
  * (SHOW PARTITIONS / ALTER TABLE DROP PARTITION), TRUNCATE TABLE,
  * table properties (SET/UNSET TBLPROPERTIES, COMMENT ON), and
  * namespaces — all bound to library primitives that commit METADATA
  * ONLY (a drop or truncate moves zero data bytes at any scale, and
  * the dropped rows stay time-travel-readable until vacuum). */
class GraftOpsSpec extends SparkSpec {

  private def freshStore(): String =
    Files.createTempDirectory("graftops").toString + "/t"

  private def table(n: Int) = spark.range(n).select(
    col("id").as("k"),
    concat(lit("p"), (col("id") % 4).cast("string")).as("part"),
    (col("id") * 10).as("v"))

  test("dropPartitions: metadata-only, loud on absent values, time travel intact") {
    val dir = freshStore()
    PartitionedTable.commit(spark, dir, table(100), "part") // v0
    val hfs = graft.streaming.VersionedStore.fs(spark, dir)
    val p1Dir = new org.apache.hadoop.fs.Path(dir, "__part=p1")
    assert(hfs.exists(p1Dir))

    val v = PartitionedTable.dropPartitions(spark, dir, Seq("p1", "p2"))
    assert(v === 1L)
    // live read excludes the dropped partitions...
    assert(PartitionedTable.read(spark, dir)
      .select("part").distinct().collect().map(_.getString(0)).sorted
      === Array("p0", "p3"))
    // ...but no data file moved: the slice dir is still on disk and the
    // prior version still reads all four partitions
    assert(hfs.exists(p1Dir), "drop must be metadata-only")
    assert(PartitionedTable.read(spark, dir, Some(0L)).count() === 100L)

    // absent partitions fail loud without ifExists, skip with it
    intercept[IllegalArgumentException](
      PartitionedTable.dropPartitions(spark, dir, Seq("p1", "nope")))
    val v2 = PartitionedTable.dropPartitions(spark, dir, Seq("p1", "nope"),
      ifExists = true) // nothing named is live: a no-op, NOT a forged version
    assert(v2 === 1L)
    assert(PartitionedTable.history(spark, dir)
      .filter(col("operation") === "drop_partitions").count() === 1L)
    // a half-live set drops the live half and records the ACTUAL count
    val v3 = PartitionedTable.dropPartitions(spark, dir, Seq("p0", "nope"),
      ifExists = true)
    assert(v3 === 2L)
    assert(PartitionedTable.history(spark, dir)
      .filter(col("operation") === "drop_partitions" && col("version") === 2)
      .select("touched").collect().head.getLong(0) === 1L)
  }

  test("truncate: empty version keeps the schema, feeds deletes, accepts new writes") {
    import spark.implicits._
    val dir = freshStore()
    PartitionedTable.commit(spark, dir, table(60), "part") // v0
    val v = PartitionedTable.truncate(spark, dir) // v1
    assert(v === 1L)

    val empty = PartitionedTable.read(spark, dir)
    assert(empty.columns.toSeq === Seq("k", "part", "v"),
      "an empty version must still resolve the table's schema")
    assert(empty.count() === 0L)
    assert(PartitionedTable.read(spark, dir, Some(0L)).count() === 60L)
    // truncate on empty is a no-op, not a forged version
    assert(PartitionedTable.truncate(spark, dir) === 1L)
    // size estimate of the empty version is zero bytes
    assert(PartitionedTable.estimateBytes(spark, dir).get === 0L)

    // the change feed across the truncate is 60 deletes
    val feed = PartitionedTable.changes(spark, dir, 0L, 1L, "k", "part")
    assert(feed.count() === 60L)
    assert(feed.select("op").distinct().collect().map(_.getString(0)).toSeq
      === Seq("delete"))

    // the table stays writable: a fresh append lands as v2
    PartitionedTable.append(spark, dir,
      Seq((1000L, "p9", 1L)).toDF("k", "part", "v"), "part")
    assert(PartitionedTable.read(spark, dir).count() === 1L)
  }

  test("SQL surface: SHOW PARTITIONS, DROP PARTITION, TRUNCATE, properties, namespaces") {
    val dir = freshStore()
    PartitionedTable.commit(spark, dir, table(80), "part")
    GraftCatalog.register(spark, "ops", "tt", dir,
      partCol = Some("part"), keyCol = Some("k"))

    assert(spark.sql("SHOW PARTITIONS graft.ops.tt")
      .collect().map(_.getString(0)).sorted
      === Array("part=p0", "part=p1", "part=p2", "part=p3"))
    assert(spark.sql("SHOW PARTITIONS graft.ops.tt PARTITION (part='p2')")
      .collect().map(_.getString(0)).toSeq === Seq("part=p2"))

    spark.sql("ALTER TABLE graft.ops.tt DROP PARTITION (part='p3')")
    assert(spark.sql("SELECT count(*) FROM graft.ops.tt").head.getLong(0) === 60L)
    // dropping it again: loud without IF EXISTS, silent with
    intercept[Exception](
      spark.sql("ALTER TABLE graft.ops.tt DROP PARTITION (part='p3')"))
    spark.sql("ALTER TABLE graft.ops.tt DROP IF EXISTS PARTITION (part='p3')")
    // ADD PARTITION is refused with direction, not silently accepted
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graft.ops.tt ADD PARTITION (part='p7')"))
    assert(e.getMessage.contains("INSERT"))

    // properties: persist, survive a fresh load, unset removes; the
    // registration contract keys are refused
    spark.sql("COMMENT ON TABLE graft.ops.tt IS 'ops demo'")
    spark.sql("ALTER TABLE graft.ops.tt SET TBLPROPERTIES ('owner.team'='etl')")
    val props = spark.sql("SHOW TBLPROPERTIES graft.ops.tt")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("owner.team") === Some("etl"))
    assert(props.get("partcol") === Some("part"))
    assert(PartitionedTable.propertiesOf(spark, dir).get("comment")
      === Some("ops demo"))
    spark.sql("ALTER TABLE graft.ops.tt UNSET TBLPROPERTIES ('owner.team')")
    assert(!spark.sql("SHOW TBLPROPERTIES graft.ops.tt")
      .collect().map(_.getString(0)).contains("owner.team"))
    intercept[Exception](spark.sql(
      "ALTER TABLE graft.ops.tt SET TBLPROPERTIES ('keycol'='v')"))

    // TRUNCATE through SQL: empty latest, time travel to the pre-drop
    // version still serves every original row
    spark.sql("TRUNCATE TABLE graft.ops.tt")
    assert(spark.sql("SELECT count(*) FROM graft.ops.tt").head.getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM graft.ops.tt VERSION AS OF 0")
      .head.getLong(0) === 80L)

    // namespaces: registered ones list; created ones appear and drop;
    // a non-empty namespace refuses DROP without CASCADE
    val ns = spark.sql("SHOW NAMESPACES IN graft")
      .collect().map(_.getString(0))
    assert(ns.contains("ops") && ns.contains("system"))
    spark.sql("CREATE NAMESPACE graft.fresh")
    assert(spark.sql("SHOW NAMESPACES IN graft")
      .collect().map(_.getString(0)).contains("fresh"))
    spark.sql("DROP NAMESPACE graft.fresh")
    assert(!spark.sql("SHOW NAMESPACES IN graft")
      .collect().map(_.getString(0)).contains("fresh"))
    intercept[Exception](spark.sql("DROP NAMESPACE graft.ops"))
    GraftCatalog.unregister("ops", "tt")
  }
}
