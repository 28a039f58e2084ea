package graft

import org.apache.spark.sql.SparkSession

/** TEMPORARY: cost of Hadoop conf construction paths. Delete after use. */
object ConfCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"$tag: ${(System.nanoTime() - t0) / 1e6 / n}%.2f ms/op")
    }
    time("sessionState.newHadoopConf", 50) {
      spark.sessionState.newHadoopConf().get("fs.defaultFS"): Unit
    }
    time("new Configuration(copy)", 50) {
      new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration).get("fs.defaultFS"): Unit
    }
    time("new Configuration()", 50) {
      new org.apache.hadoop.conf.Configuration().get("fs.defaultFS"): Unit
    }
    time("Job.getInstance", 50) {
      org.apache.hadoop.mapreduce.Job.getInstance(
        spark.sessionState.newHadoopConf()).getConfiguration
        .get("fs.defaultFS"): Unit
    }
    time("spark.read.parquet(resolve only)", 20) {
      spark.read.parquet("/root/testdata/sf0.001/nation.parquet"): Unit
    }
    time("read+head", 20) {
      spark.read.parquet("/root/testdata/sf0.001/nation.parquet").head(): Unit
    }
    val schema = spark.read.parquet("/root/testdata/sf0.001/nation.parquet").schema
    time("read with explicit schema (resolve)", 20) {
      spark.read.schema(schema)
        .parquet("/root/testdata/sf0.001/nation.parquet"): Unit
    }
    time("read explicit schema mergeSchema=true (resolve)", 20) {
      spark.read.schema(schema).option("mergeSchema", "true")
        .parquet("/root/testdata/sf0.001/nation.parquet"): Unit
    }
    // sample the driver during 100 resolutions to see the hot path
    val t = new Thread(() => {
      (1 to 100).foreach(_ =>
        spark.read.parquet("/root/testdata/sf0.001/nation.parquet"))
    })
    t.start()
    val counts = scala.collection.mutable.Map.empty[String, Int]
    while (t.isAlive) {
      val st = t.getStackTrace
      st.take(25).reverseIterator
        .find(e => e.getClassName.startsWith("org.apache") &&
          !e.getClassName.contains("sql.classic"))
        .orElse(st.headOption)
        .foreach(e => counts.updateWith(
          e.getClassName + "." + e.getMethodName)(c => Some(c.getOrElse(0) + 1)))
      Thread.sleep(5)
    }
    counts.toSeq.sortBy(-_._2).take(15).foreach { case (k, v) =>
      println(s"  sample $v  $k")
    }
    spark.stop()
  }
}
