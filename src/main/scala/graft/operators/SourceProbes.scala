package graft.operators

import graft.{QueryDef, Tables}
import graft.pipeline.Sources

/** Driver-visible gate for the S1 JDBC range-partitioned scan
  * (`graft.pipeline.Sources.jdbcPartitioned`): the harness has no external
  * database, so the probe round-trips the `nation` table through the
  * embedded Derby that ships with Spark — write over JDBC, read back with
  * a 4-way range-partitioned scan (each task issues its own bounded
  * query, the distributed form of the reference's single-connection
  * `index BETWEEN` loop, `ingestToBronze.py:43-49`). Rows-only driver
  * check (the JDBC sink is a side effect DuckDB cannot see); the same
  * path's values/partitioning are asserted in `SourcesSpec`.
  */
object SourceProbes {

  private val Driver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** One Derby database directory per JVM, removed at exit. Embedded
    * Derby permits only ONE booting JVM per database directory, so a
    * fixed shared path would make concurrent Bench/Verify processes fail
    * with XSDB6; a fresh directory per *invocation* would leak one
    * database per call. Per-process + shutdown-hook cleanup avoids both.
    * The table is overwritten on each invocation within the JVM. */
  private lazy val dbDir: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft-derby-rt")
    // keep Derby's engine log out of the process working directory
    if (sys.props.get("derby.stream.error.file").isEmpty)
      System.setProperty("derby.stream.error.file", d.resolve("derby.log").toString)
    sys.addShutdownHook {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
      }
      del(d.toFile)
    }
    d
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.noOracle("jdbc_roundtrip") { (s, dir) =>
      val db = dbDir.resolve("db")
      Tables.nation(s, dir)
        .write.format("jdbc")
        .option("url", s"jdbc:derby:$db;create=true")
        .option("driver", Driver)
        .option("dbtable", "nation")
        .mode("overwrite")
        .save()
      Sources.jdbcPartitioned(s, "nation", "n_nationkey",
        lowerBound = 0L, upperBound = 25L, numPartitions = 4,
        options = Map("url" -> s"jdbc:derby:$db", "driver" -> Driver))
    }
  )
}
