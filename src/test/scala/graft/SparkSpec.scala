package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the test suites — one per JVM (the forked
  * test JVM), warehouse + metastore in a temp dir so `saveAsTable` works
  * against the built-in catalog without touching the repo tree. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  // route the embedded Derby engine log (SourcesSpec, jdbc_roundtrip) to
  // tmp instead of the forked test JVM's working directory (the repo
  // root); runs at suite construction, before any Derby boot
  if (sys.props.get("derby.stream.error.file").isEmpty)
    System.setProperty("derby.stream.error.file",
      s"${sys.props("java.io.tmpdir")}/graft-derby-test.log")

  lazy val spark: SparkSession = SparkSpec.session
  override def afterAll(): Unit = () // session shared across suites; JVM exit cleans up
}

object SparkSpec {
  lazy val session: SparkSession = {
    val base = Files.createTempDirectory("graft-test").toString
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
