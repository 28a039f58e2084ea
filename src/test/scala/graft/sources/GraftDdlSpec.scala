package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.PartitionedTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** SQL DDL through the catalog: CREATE TABLE / CTAS declare an empty
  * PartitionedTable whose first write commits v0 against the
  * declaration; ALTER TABLE binds ADD COLUMN (metadata-only,
  * declared-type null-fill), RENAME/DROP COLUMN (rename-chain mapping)
  * and CHECK constraints onto the library catalog writes; DROP TABLE
  * removes the directory; RENAME TO re-binds the identifier. Guards:
  * non-string partition column, NOT NULL adds, contract-column
  * renames, declared-type mismatches all fail loud. */
class GraftDdlSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graftddl").toString + "/t"

  private var seq = 0
  private def freshName(): String = { seq += 1; s"graft.ddl.d$seq" }

  // bind the catalog name once (register also does this; DDL-first
  // tests need it before any registration exists)
  private def ensureCatalog(): Unit =
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft",
        classOf[GraftCatalog].getName)

  test("CREATE TABLE declares an empty table; reads resolve the declared schema; INSERT commits v0; MERGE works via keycol") {
    ensureCatalog()
    val dir = freshDir(); val t = freshName()
    spark.sql(s"CREATE TABLE $t (k BIGINT, part STRING, v BIGINT) " +
      s"PARTITIONED BY (part) LOCATION '$dir' TBLPROPERTIES ('keycol'='k')")
    // empty read at the declared schema
    val empty = spark.sql(s"SELECT * FROM $t")
    assert(empty.count() === 0)
    assert(empty.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Seq(("k", LongType), ("part", StringType), ("v", LongType)))
    // no forged manifest version exists until data lands
    assert(PartitionedTable.versions(spark, dir).isEmpty)
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 10), (2, 'b', 20)")
    assert(PartitionedTable.versions(spark, dir) === Seq(0L))
    assert(spark.sql(s"SELECT sum(v) AS s FROM $t").head().getLong(0) === 30)
    // row identity from the keycol property: SQL UPDATE works
    spark.sql(s"UPDATE $t SET v = 99 WHERE k = 1")
    assert(spark.sql(s"SELECT v FROM $t WHERE k = 1").head().getLong(0) === 99)
  }

  test("CTAS: schema and rows come from the query; result equals the query") {
    ensureCatalog()
    val dir = freshDir(); val t = freshName()
    spark.sql(s"CREATE TABLE $t PARTITIONED BY (part) LOCATION '$dir' AS " +
      "SELECT id AS k, cast(id % 3 AS string) AS part, id * 2 AS v " +
      "FROM range(100)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0) === 100)
    assert(spark.sql(s"SELECT sum(v) AS s FROM $t").head().getLong(0) === 9900)
    assert(PartitionedTable.partitionValues(spark, dir).sorted ===
      Seq("0", "1", "2"))
    // partition pruning survives a DDL-created table
    assert(spark.sql(s"SELECT count(*) AS n FROM $t WHERE part = '1'")
      .head().getLong(0) === 33)
  }

  test("CREATE TABLE guards: non-string partition column, missing PARTITIONED BY, duplicate identifier; IF NOT EXISTS no-ops") {
    ensureCatalog()
    val t = freshName()
    val e1 = intercept[Exception](spark.sql(
      s"CREATE TABLE $t (k BIGINT, part BIGINT) PARTITIONED BY (part) " +
        s"LOCATION '${freshDir()}'"))
    assert(e1.getMessage.contains("must be a string"))
    val e2 = intercept[Exception](spark.sql(
      s"CREATE TABLE $t (k BIGINT, part STRING) LOCATION '${freshDir()}'"))
    assert(e2.getMessage.contains("PARTITIONED BY"))
    val dir = freshDir()
    spark.sql(s"CREATE TABLE $t (k BIGINT, part STRING) " +
      s"PARTITIONED BY (part) LOCATION '$dir'")
    val e3 = intercept[Exception](spark.sql(
      s"CREATE TABLE $t (k BIGINT, part STRING) PARTITIONED BY (part) " +
        s"LOCATION '${freshDir()}'"))
    assert(e3.getMessage.toUpperCase.contains("EXISTS"))
    // IF NOT EXISTS: no error, binding unchanged
    spark.sql(s"CREATE TABLE IF NOT EXISTS $t (k BIGINT, part STRING) " +
      s"PARTITIONED BY (part) LOCATION '${freshDir()}'")
    assert(spark.sql(s"SELECT * FROM $t").schema.fieldNames.toSeq ===
      Seq("k", "part"))
  }

  test("ALTER TABLE ADD COLUMN: metadata-only, null-fills at the declared type, later writes materialize it; NOT NULL refused; declared type enforced on library writes") {
    ensureCatalog()
    val dir = freshDir(); val t = freshName()
    spark.sql(s"CREATE TABLE $t (k BIGINT, part STRING, v BIGINT) " +
      s"PARTITIONED BY (part) LOCATION '$dir' TBLPROPERTIES ('keycol'='k')")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 10)")
    val vBefore = PartitionedTable.latest(spark, dir).get
    spark.sql(s"ALTER TABLE $t ADD COLUMN note STRING")
    // no table version minted, no data moved
    assert(PartitionedTable.latest(spark, dir).get === vBefore)
    val row = spark.sql(s"SELECT k, note FROM $t").head()
    assert(row.getLong(0) === 1 && row.isNullAt(1))
    // a later INSERT materializes it; old rows stay null
    spark.sql(s"INSERT INTO $t VALUES (2, 'a', 20, 'hello')")
    assert(spark.sql(s"SELECT note FROM $t WHERE k = 2").head()
      .getString(0) === "hello")
    assert(spark.sql(s"SELECT note FROM $t WHERE k = 1").head().isNullAt(0))
    // NOT NULL add is unsatisfiable for existing rows
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $t ADD COLUMN bad STRING NOT NULL"))
    assert(e.getMessage.contains("unsatisfiable") ||
      e.getMessage.toUpperCase.contains("NOT NULL"))
    // declared type is the contract on the library path too
    val e2 = intercept[Exception](PartitionedTable.append(spark, dir,
      spark.range(1).select(lit(3L).as("k"), lit("a").as("part"),
        lit(1L).as("v"), lit(123).as("note")), "part"))
    assert(e2.getMessage.contains("declared types are the contract"))
  }

  test("ALTER TABLE RENAME/DROP COLUMN ride the rename-chain mapping; contract columns refuse; RENAME TO re-binds; DROP TABLE removes the directory") {
    ensureCatalog()
    val dir = freshDir(); val t = freshName()
    spark.sql(s"CREATE TABLE $t (k BIGINT, part STRING, v BIGINT, " +
      s"junk STRING) PARTITIONED BY (part) LOCATION '$dir' " +
      "TBLPROPERTIES ('keycol'='k')")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 10, 'x')")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO score")
    assert(spark.sql(s"SELECT score FROM $t WHERE k = 1").head()
      .getLong(0) === 10)
    spark.sql(s"ALTER TABLE $t DROP COLUMN junk")
    assert(!spark.sql(s"SELECT * FROM $t").columns.contains("junk"))
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $t RENAME COLUMN part TO p2"))
    assert(e.getMessage.contains("layout contract"))
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE $t DROP COLUMN k"))
    assert(e2.getMessage.contains("row-identity contract"))
    // RENAME TO: identifier moves, the directory and its versions stay
    val t2 = freshName()
    spark.sql(s"ALTER TABLE $t RENAME TO ${t2.stripPrefix("graft.")}")
    assert(spark.sql(s"SELECT count(*) AS n FROM $t2").head().getLong(0) === 1)
    intercept[Exception](spark.sql(s"SELECT * FROM $t"))
    // DROP TABLE: binding gone, directory gone
    spark.sql(s"DROP TABLE $t2")
    intercept[Exception](spark.sql(s"SELECT * FROM $t2"))
    assert(!new java.io.File(dir).exists())
  }

  test("CREATE TABLE PARTITIONED BY (months(ts)) binds to the generated-rule machinery: writes derive the partition, reads prune from source predicates") {
    ensureCatalog()
    val dir = freshDir(); val t = freshName()
    spark.sql(s"CREATE TABLE $t (k BIGINT, d DATE, v BIGINT) " +
      s"PARTITIONED BY (months(d)) LOCATION '$dir' " +
      "TBLPROPERTIES ('keycol'='k')")
    // the engine owns the mapping: INSERTs ship only source columns
    spark.sql(s"INSERT INTO $t SELECT id, " +
      "date_add(DATE '1995-01-01', cast(id * 20 AS int)), id * 10 " +
      "FROM range(10)")
    assert(PartitionedTable.partitionValues(spark, dir).sorted ===
      Seq("1995-01", "1995-02", "1995-03", "1995-04", "1995-05", "1995-06"))
    // post-v0 the derived column is part of the schema: NULL derives,
    // a wrong explicit value fails loud inside the landing job
    spark.sql(s"INSERT INTO $t VALUES (100, DATE '1995-07-04', 1, NULL)")
    assert(spark.sql(s"SELECT part_month FROM $t WHERE k = 100").head()
      .getString(0) === "1995-07")
    val e = intercept[Exception](spark.sql(
      s"INSERT INTO $t VALUES (101, DATE '1995-07-04', 1, '1995-08')"))
    assert(e.getMessage.contains("must equal its declared rule"))
    // source-range predicates prune at the manifest through spark.sql
    val q = spark.sql(s"SELECT k FROM $t " +
      "WHERE d BETWEEN DATE '1995-02-10' AND DATE '1995-03-20'")
    val dirsRead = q.queryExecution.executedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.RowDataSourceScanExec =>
        r.relation
    }.collect { case g: GraftRelation => g.scan }.get.buildDf(spark)
      .inputFiles
      .map(_.split("/").find(_.startsWith("__part=")).getOrElse("?")).toSet
    assert(dirsRead === Set("__part=1995-02", "__part=1995-03"),
      s"DDL-created generated table must source-prune, got $dirsRead")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L),
      "mid-month bounds stay exact via the residual")
    // keyed DML rides the derived partition too
    spark.sql(s"UPDATE $t SET v = 999 WHERE k = 3")
    assert(spark.sql(s"SELECT v FROM $t WHERE k = 3").head().getLong(0) === 999)
  }

  test("CREATE TABLE PARTITIONED BY (truncate(status,1), months(d)) declares a two-level spec: writes derive both levels, reads prune from both source predicates") {
    ensureCatalog()
    val dir = freshDir(); val t = freshName()
    spark.sql(s"CREATE TABLE $t (k BIGINT, status STRING, d DATE, " +
      "v BIGINT) PARTITIONED BY (truncate(status, 1), months(d)) " +
      s"LOCATION '$dir' TBLPROPERTIES ('keycol'='k')")
    spark.sql(s"INSERT INTO $t SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'open' ELSE 'closed' END, " +
      "date_add(DATE '1995-01-01', cast(id * 20 AS int)), id * 10 " +
      "FROM range(10)")
    assert(PartitionedTable.partitionValues(spark, dir).sorted ===
      Seq("c/1995-01", "c/1995-03", "c/1995-04", "c/1995-05", "c/1995-06",
        "o/1995-01", "o/1995-02", "o/1995-03", "o/1995-05", "o/1995-06"))
    // both source predicates prune at the manifest through spark.sql
    val q = spark.sql(s"SELECT k FROM $t WHERE status = 'open' " +
      "AND d BETWEEN DATE '1995-02-10' AND DATE '1995-05-20'")
    val dirsRead = q.queryExecution.executedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.RowDataSourceScanExec =>
        r.relation
    }.collect { case g: GraftRelation => g.scan }.get.buildDf(spark)
      .inputFiles
      .map(_.split("/").find(_.startsWith("__part=")).getOrElse("?")).toSet
    // inputFiles returns URIs: the hive-escaped '%2F' re-encodes as %252F
    assert(dirsRead === Set("__part=o%252F1995-02", "__part=o%252F1995-03",
      "__part=o%252F1995-05"),
      s"two-level DDL table must prune on both levels, got $dirsRead")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 4L, 6L))
    // keyed DML rides the derived levels
    spark.sql(s"UPDATE $t SET v = 123 WHERE k = 6")
    assert(spark.sql(s"SELECT v FROM $t WHERE k = 6").head().getLong(0) === 123)
    assert(spark.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0) === 10,
      "an UPDATE must replace, not duplicate")
  }

  test("CTAS with a hidden-partitioning transform: the query ships source columns, the table derives the partition; SHOW TABLES lists the bindings") {
    ensureCatalog()
    val dir = freshDir(); val t = freshName()
    spark.sql(s"CREATE TABLE $t PARTITIONED BY (months(d)) LOCATION '$dir' " +
      "AS SELECT id AS k, " +
      "to_date(concat('1995-0', cast(id % 3 + 1 AS string), '-10')) AS d " +
      "FROM range(9)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0) === 9)
    assert(PartitionedTable.partitionValues(spark, dir).sorted ===
      Seq("1995-01", "1995-02", "1995-03"))
    val listed = spark.sql("SHOW TABLES IN graft.ddl")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(listed.contains(t.stripPrefix("graft.ddl.")), s"got $listed")
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT CHECK bind to the persistent constraint catalog: violating writes fail loud until dropped") {
    ensureCatalog()
    val dir = freshDir(); val t = freshName()
    spark.sql(s"CREATE TABLE $t (k BIGINT, part STRING, v BIGINT) " +
      s"PARTITIONED BY (part) LOCATION '$dir'")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 10)")
    spark.sql(s"ALTER TABLE $t ADD CONSTRAINT positive CHECK (v > 0)")
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $t VALUES (2, 'a', -5)"))
    assert(e.getMessage.contains("positive"))
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT positive")
    spark.sql(s"INSERT INTO $t VALUES (2, 'a', -5)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0) === 2)
  }
}
