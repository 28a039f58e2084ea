package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** TEMPORARY micro-probe of per-round walk cost shapes. Delete after use. */
object RoundCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Sessions.tune(spark)
    val emb = Tables.embeddings(spark, dir)
    // mimic symmetrized graph: payload-carrying edges, checkpointed
    val e0 = emb.select(col("vec_id"), col("embedding"))
    val edges = e0.as("a").join(e0.as("b"),
        col("a.vec_id") =!= col("b.vec_id") &&
        pmod(col("a.vec_id") + col("b.vec_id"), lit(97)) < 2)
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr"),
        col("b.embedding").as("ne"))
      .localCheckpoint(true)
    println("edges=" + edges.count() + " parts=" + edges.rdd.getNumPartitions)
    val qe: Seq[Float] = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toSeq

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val ids: Seq[Long] = Seq(1L, 3L, 5L, 7L, 9L, 11L, 13L, 15L)
    // A: isin with changing literals (codegen cache miss per round?)
    for (r <- 1 to 10) time(s"A isin round $r") {
      edges.filter(col("vec_id").isin(ids.map(_ + r): _*))
        .select(col("nbr").as("vec_id"),
          VectorOps.cosineR(col("ne"), typedLit(qe)).as("cos"))
        .groupBy("vec_id").agg(max("cos").as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(32)
        .collect(): Unit
    }
    // B: same with STABLE literals (cache hit after round 1)
    for (r <- 1 to 10) time(s"B isin-stable round $r") {
      edges.filter(col("vec_id").isin(ids: _*))
        .select(col("nbr").as("vec_id"),
          VectorOps.cosineR(col("ne"), typedLit(qe)).as("cos"))
        .groupBy("vec_id").agg(max("cos").as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(32)
        .collect(): Unit
    }
    // C: AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (r <- 1 to 10) time(s"C isin-noaqe round $r") {
      edges.filter(col("vec_id").isin(ids.map(_ + r): _*))
        .select(col("nbr").as("vec_id"),
          VectorOps.cosineR(col("ne"), typedLit(qe)).as("cos"))
        .groupBy("vec_id").agg(max("cos").as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(32)
        .collect(): Unit
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // D: join against LocalRelation instead of isin
    import scala.jdk.CollectionConverters._
    for (r <- 1 to 10) time(s"D join round $r") {
      val fDf = spark.createDataFrame(
        ids.map(i => org.apache.spark.sql.Row(i + r)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType, nullable = false))))
      edges.join(broadcast(fDf), "vec_id")
        .select(col("nbr").as("vec_id"),
          VectorOps.cosineR(col("ne"), typedLit(qe)).as("cos"))
        .groupBy("vec_id").agg(max("cos").as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(32)
        .collect(): Unit
    }
    // E: pure job overhead floor — count over the checkpointed edges
    for (r <- 1 to 5) time(s"E floor count $r") { edges.count(): Unit }
    spark.stop()
  }
}
