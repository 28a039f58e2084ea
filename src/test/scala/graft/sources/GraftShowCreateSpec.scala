package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.PartitionedTable
import org.apache.spark.sql.functions._

/** SHOW CREATE TABLE renders the FULL layout contract — columns with
  * DEFAULTs, identity or hidden-transform partitioning, CHECK
  * constraints, LOCATION, keycol — as DDL that RE-EXECUTES into an
  * equivalently-contracted empty table; and CREATE TABLE LIKE (spelled
  * `CALL graft.system.create_like` — Spark's LIKE grammar takes
  * 1-2-part identifiers and can never reach a named catalog) copies
  * the same contract with no data. */
class GraftShowCreateSpec extends SparkSpec {

  private def ensureCatalog(): Unit =
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  private def contractOf(t: String): (Seq[(String, String)], Seq[String],
      Option[String], Option[String], Seq[String]) = {
    val ident = t.stripPrefix("graft.").split("\\.")
    val table = new GraftCatalog().loadTable(
      org.apache.spark.sql.connector.catalog.Identifier
        .of(Array(ident(0)), ident(1))).asInstanceOf[GraftTable]
    val props = table.properties()
    (table.schema().fields.toSeq.map(f => (f.name, f.dataType.simpleString)),
      table.partitioning().toSeq.map(_.describe()),
      Option(props.get("partcol")), Option(props.get("keycol")),
      table.constraints().toSeq.map(_.toDDL))
  }

  test("SHOW CREATE TABLE output re-executes: identity partitioning, DEFAULT column, CHECK constraint, keycol") {
    ensureCatalog()
    val base = Files.createTempDirectory("graftsct").toString
    spark.sql(
      s"""CREATE TABLE graft.sct.t (k BIGINT, part STRING, v BIGINT DEFAULT 7)
         |PARTITIONED BY (part) LOCATION '$base/t'
         |TBLPROPERTIES ('keycol' = 'k')""".stripMargin)
    spark.sql("ALTER TABLE graft.sct.t ADD CONSTRAINT v_pos CHECK (v >= 0)")
    spark.sql("INSERT INTO graft.sct.t (k, part) VALUES (1, 'p0')")

    val ddl = spark.sql("SHOW CREATE TABLE graft.sct.t").head.getString(0)
    assert(ddl.contains("DEFAULT 7"), s"DEFAULT must render: $ddl")
    assert(ddl.contains("CONSTRAINT v_pos CHECK"), s"constraint: $ddl")
    assert(ddl.contains("PARTITIONED BY (part)"), s"partitioning: $ddl")
    assert(ddl.contains("'keycol' = 'k'"), s"keycol: $ddl")

    // re-execute at a fresh identifier + location
    val rt = ddl
      .replace("TABLE graft.sct.t (", "TABLE graft.sct.t_rt (")
      .replaceAll("LOCATION '[^']*'", s"LOCATION '$base/t_rt'")
    spark.sql(rt)
    val (cols, parts, pc, kc, cons) = contractOf("graft.sct.t_rt")
    val (cols0, parts0, pc0, kc0, cons0) = contractOf("graft.sct.t")
    assert(cols === cols0, "re-executed DDL must declare the same columns")
    assert(parts === parts0 && parts === Seq("part")) // identity(part)
    assert(pc === pc0 && kc === kc0)
    assert(cons === cons0 && cons.exists(_.contains("v_pos")))
    // ...and the contract is LIVE: DEFAULT fills, constraint enforces
    spark.sql("INSERT INTO graft.sct.t_rt (k, part) VALUES (9, 'p1')")
    assert(spark.sql("SELECT v FROM graft.sct.t_rt").head.getLong(0) === 7L)
    intercept[Exception](spark.sql(
      "INSERT INTO graft.sct.t_rt VALUES (10, 'p1', -5)").collect())
    Seq("t", "t_rt").foreach(n => GraftCatalog.unregister("sct", n))
  }

  test("SHOW CREATE TABLE round-trips hidden partitioning: transforms render and re-execute") {
    ensureCatalog()
    val base = Files.createTempDirectory("graftsctg").toString
    spark.sql(
      s"""CREATE TABLE graft.sct.g (k BIGINT, d TIMESTAMP, v BIGINT)
         |PARTITIONED BY (months(d)) LOCATION '$base/g'""".stripMargin)
    spark.sql("INSERT INTO graft.sct.g VALUES " +
      "(1, TIMESTAMP '1996-01-15 00:00:00', 10)")
    val ddl = spark.sql("SHOW CREATE TABLE graft.sct.g").head.getString(0)
    assert(ddl.contains("PARTITIONED BY (months(d))"),
      s"hidden partitioning must render as its transform: $ddl")
    // the column list includes the DERIVED column (it IS the read
    // schema); re-execution strips it back into the rule
    assert(ddl.contains("part_month"), s"derived col in read schema: $ddl")
    val rt = ddl
      .replace("TABLE graft.sct.g (", "TABLE graft.sct.g_rt (")
      .replaceAll("LOCATION '[^']*'", s"LOCATION '$base/g_rt'")
    spark.sql(rt)
    val (_, parts, _, _, _) = contractOf("graft.sct.g_rt")
    assert(parts === Seq("months(d)"))
    // the rule is live: an INSERT into the (still-empty) re-created
    // table ships only SOURCE columns — the declared derived column was
    // stripped back into the rule — and the engine derives the month
    spark.sql("INSERT INTO graft.sct.g_rt VALUES " +
      "(2, TIMESTAMP '1997-03-02 00:00:00', 20)")
    assert(PartitionedTable.partitionValues(spark, s"$base/g_rt")
      === Seq("1997-03"))
    Seq("g", "g_rt").foreach(n => GraftCatalog.unregister("sct", n))
  }

  test("create_like copies the layout contract with NO data: two-level transforms, keycol, constraints") {
    ensureCatalog()
    val base = Files.createTempDirectory("graftsctl").toString
    spark.sql(
      s"""CREATE TABLE graft.sct.src (k BIGINT, status STRING, d TIMESTAMP,
         |v BIGINT)
         |PARTITIONED BY (truncate(status, 1), months(d))
         |LOCATION '$base/src' TBLPROPERTIES ('keycol' = 'k')""".stripMargin)
    spark.sql("ALTER TABLE graft.sct.src ADD CONSTRAINT k_pos CHECK (k > 0)")
    spark.sql("INSERT INTO graft.sct.src VALUES " +
      "(1, 'OPEN', TIMESTAMP '1996-01-15 00:00:00', 10)")

    val summary = spark.sql(
      s"""CALL graft.system.create_like(table => 'sct.src',
         |target => 'sct.dst', location => '$base/dst')""".stripMargin)
      .collect().head
    assert(summary.getInt(3) === 1, "constraint count in the summary")

    val (colsS, partsS, pcS, kcS, consS) = contractOf("graft.sct.src")
    val (colsD, partsD, pcD, kcD, consD) = contractOf("graft.sct.dst")
    // the target declares the source's LOGICAL columns; its derived
    // partition columns materialize on the first write (the empty-table
    // schema contract CTAS'd tables share), so compare the declared set
    assert(colsD === Seq(("k", "bigint"), ("status", "string"),
      ("d", "timestamp"), ("v", "bigint")))
    assert(colsS.take(4) === colsD,
      "source and target agree on every declared column")
    assert(partsD === partsS, s"transforms must carry over: $partsD")
    assert(partsD.exists(_.startsWith("truncate")) &&
      partsD.exists(_.startsWith("months")), s"got $partsD")
    assert(pcD === pcS && kcD === kcS)
    assert(consD === consS && consD.exists(_.contains("k_pos")))
    // NO data and NO store pointers (that would be clone)
    assert(spark.sql("SELECT count(*) FROM graft.sct.dst").head.getLong(0) === 0L)
    assert(PartitionedTable.latest(spark, s"$base/dst").isEmpty,
      "create_like must not mint a manifest version")
    // the contract is live: derive both levels, enforce the constraint
    spark.sql("INSERT INTO graft.sct.dst VALUES " +
      "(5, 'CLOSED', TIMESTAMP '1997-02-01 00:00:00', 1)")
    assert(spark.sql("SELECT k FROM graft.sct.dst").head.getLong(0) === 5L)
    intercept[Exception](spark.sql(
      "INSERT INTO graft.sct.dst VALUES " +
        "(-1, 'X', TIMESTAMP '1997-02-01 00:00:00', 1)").collect())
    Seq("src", "dst").foreach(n => GraftCatalog.unregister("sct", n))
  }

  test("create_like strips the source's CUSTOM derived level names — they never land as data columns in the target") {
    ensureCatalog()
    val base = Files.createTempDirectory("graftsctl2").toString
    val src = s"$base/src"
    // library-registered source with NON-canonical derived names:
    // planTable only strips the canonical names it regenerates, so
    // without the procedure-side strip 'ps'/'pm' would become ordinary
    // string data columns in the target
    PartitionedTable.commitLevels(spark, src,
      spark.range(4).select(col("id").as("k"),
        concat(lit("S"), (col("id") % 2).cast("string")).as("st"),
        to_date(lit("1996-01-15")).as("d")),
      Seq(
        PartitionedTable.GenLevel("st",
          PartitionedTable.PartGen.Prefix(2), "ps"),
        PartitionedTable.GenLevel("d",
          PartitionedTable.PartGen.Month, "pm")))
    GraftCatalog.register(spark, "sct", "csrc", src,
      partCol = Some(PartitionedTable.LevelsPartName))
    val summary = spark.sql(
      s"""CALL graft.system.create_like(table => 'sct.csrc',
         |target => 'sct.cdst', location => '$base/dst')""".stripMargin)
      .collect().head
    assert(summary.getInt(2) === 3,
      s"n_columns must count DATA columns only, got ${summary.getInt(2)}")
    val cols = spark.table("graft.sct.cdst").schema.fieldNames.toSet
    assert(!cols.contains("ps") && !cols.contains("pm") &&
      !cols.contains(PartitionedTable.LevelsPartName),
      s"derived names leaked into the target as data columns: $cols")
    assert(Set("k", "st", "d").subsetOf(cols), s"got $cols")
    // the layout contract is live: an INSERT ships only source columns
    // and the engine derives both levels
    spark.sql("INSERT INTO graft.sct.cdst VALUES " +
      "(9, 'S1X', DATE '1997-02-01')")
    assert(PartitionedTable.partitionValues(spark, s"$base/dst")
      === Seq("S1/1997-02"))
    Seq("csrc", "cdst").foreach(n => GraftCatalog.unregister("sct", n))
  }
}
