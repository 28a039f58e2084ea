package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** TEMPORARY: per-query Spark job census (count + wall per job) for a
  * named registered query at a given SF. Delete after use. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val extraConf = args.drop(2).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    extraConf.foreach { case (k, v) => spark.conf.set(k, v) }
    // warm-up pass (codegen)
    try SparkEntry.queries(name)(spark, dir).write.format("noop")
      .mode("overwrite").save()
    catch { case e: Throwable => println("warmup failed: " + e) }
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, String, Int)]
    var stages = 0
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts(e.jobId) = (System.nanoTime(),
          Option(e.properties.getProperty("spark.job.description"))
            .getOrElse(e.stageInfos.headOption.map(_.name).getOrElse("?")).take(90))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (t0, d) =>
          rows += ((e.jobId, (System.nanoTime() - t0) / 1e9, d, 0))
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages += 1
    }
    spark.sparkContext.addSparkListener(l)
    val phaseTotals = scala.collection.concurrent.TrieMap.empty[String, Long]
    var actions = 0
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        actions += 1
        qe.tracker.phases.foreach { case (ph, s) =>
          phaseTotals.updateWith(ph)(o =>
            Some(o.getOrElse(0L) + (s.endTimeMs - s.startTimeMs))): Unit
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(qel)
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).write.format("noop")
      .mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(l)
    println(f"QUERY $name wall=$wall%.3f jobs=${rows.size} stages=$stages")
    rows.sortBy(-_._2).take(30).foreach { case (id, s, d, _) =>
      println(f"  job $id%4d ${s}%.3f s  $d")
    }
    println(f"  sum-of-jobs=${rows.map(_._2).sum}%.3f")
    println(s"  tracked-actions=$actions phases(ms)=" +
      phaseTotals.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }
        .mkString(", "))
    spark.stop()
  }
}
