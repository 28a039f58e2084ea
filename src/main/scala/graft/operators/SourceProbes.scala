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

  val defs: Seq[QueryDef] = Seq(
    QueryDef.noOracle("jdbc_roundtrip") { (s, dir) =>
      // fixed location, reused (table overwritten) across invocations — a
      // fresh createTempDirectory per call would accumulate one Derby
      // database per Verify/Bench run and pin each in the embedded engine
      val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft-derby-rt")
      java.nio.file.Files.createDirectories(base)
      // keep Derby's engine log out of the process working directory
      // (no-op if the embedded engine already booted with another target)
      if (sys.props.get("derby.stream.error.file").isEmpty)
        System.setProperty("derby.stream.error.file", base.resolve("derby.log").toString)
      val db = base.resolve("db")
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
