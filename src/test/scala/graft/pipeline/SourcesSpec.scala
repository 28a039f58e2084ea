package graft.pipeline

import java.nio.file.Files
import java.sql.DriverManager

import graft.SparkSpec

/** Executes the S1 JDBC range-partitioned scan against the embedded Derby
  * that ships with Spark — proving the partitioned read path end-to-end
  * (each partition issues its own range-bounded query, the distributed
  * form of the reference's single-connection `index BETWEEN` subquery). */
class SourcesSpec extends SparkSpec {

  test("jdbcPartitioned: range-partitioned read against embedded Derby") {
    val dbDir = Files.createTempDirectory("graft-derby").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE flights (idx BIGINT PRIMARY KEY, fare DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO flights VALUES (?, ?)")
      (0 until 200).foreach { i =>
        ps.setLong(1, i.toLong); ps.setDouble(2, 100.0 + i); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()

    val df = Sources.jdbcPartitioned(spark, "flights", "idx",
      lowerBound = 0L, upperBound = 200L, numPartitions = 4,
      options = Map(
        "url" -> s"jdbc:derby:$dbDir",
        "driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 200)
    assert(df.agg(org.apache.spark.sql.functions.sum("fare")).head().getDouble(0)
      === (0 until 200).map(100.0 + _).sum)

    // the partition column predicate prunes inside the database
    val slice = df.filter(df("idx") < 50)
    assert(slice.count() === 50)
  }

  test("csv: malformed rows surface as nulls, not failures (PERMISSIVE)") {
    val dir = Files.createTempDirectory("graft-csv")
    Files.writeString(dir.resolve("bad.csv"),
      "index,legId,searchDate\n" +       // header missing most columns
        "0,leg0,2022-04-16\n" +
        "not-a-long,leg1,2022-04-17\n")  // unparseable index
    val df = Sources.csv(spark, dir.toString)
    val rows = df.select("index", "legId", "totalFare").collect()
    assert(rows.length === 2)
    assert(rows.map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
      === Set(Some(0L), None))
    assert(rows.forall(_.isNullAt(2)), "absent columns arrive as nulls")
  }

  test("pathExists distinguishes present and absent paths") {
    val p = Files.createTempDirectory("graft-probe")
    assert(Sources.pathExists(spark, p.toString))
    assert(!Sources.pathExists(spark, s"$p/definitely-not-there"))
  }
}
