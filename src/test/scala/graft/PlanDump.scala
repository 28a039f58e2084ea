package graft

import org.apache.spark.sql.SparkSession

/** TEMPORARY evidence tool: dump `.explain("formatted")` for named
  * registered queries to plans/<tag>/<name>_<suffix>.txt. Delete after
  * the round. Usage:
  *   Test/runMain graft.PlanDump <tag> <suffix> <query>[,query...] [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <q1,q2,...> [sfDir]")
    val (tag, suffix) = (args(0), args(1))
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(out)
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(out.resolve(s"${name}_$suffix.txt"), txt)
        println(s"dumped $name -> plans/$tag/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"FAILED $name: $e")
      }
    }
    spark.stop()
  }
}
