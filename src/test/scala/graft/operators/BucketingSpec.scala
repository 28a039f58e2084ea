package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed tables join without any shuffle exchange") {
    val root = Files.createTempDirectory("graft-bucket").toString
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")

    val fact = spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
    val dim = spark.range(0, 1000)
      .select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))

    Bucketing.writeBucketed(fact, "bkt.fact", s"$root/fact", "k", buckets = 8)
    Bucketing.writeBucketed(dim, "bkt.dim", s"$root/dim", "k", buckets = 8)

    // bucketed scans need the bucketing-aware planner path (on by default);
    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "bkt.fact", "bkt.dim", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected a co-located join with no shuffle, got:\n$plan")
      assert(joined.count() === 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("LLM bucketed layout: the m01 join plans with zero shuffle on either side") {
    val dir = "/root/testdata/sf0.001"
    val (docs, embs) = Bucketing.llmTables(spark, dir, buckets = 4)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = docs.join(embs, col("doc_id") === col("vec_id"))
        .groupBy("lang", "label").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the ONLY hash exchange is the final groupBy's — the join itself
      // reads both sides co-located from the bucketed layout
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges === 1,
        s"expected the join to be exchange-free (1 agg exchange only), got $exchanges:\n$plan")

      // layout must not change results: same rows as the plain parquet join
      val plain = graft.Tables.documents(spark, dir)
        .join(graft.Tables.embeddings(spark, dir), col("doc_id") === col("vec_id"))
        .groupBy("lang", "label").agg(count(lit(1)).as("n"))
      assert(joined.collect().toSet === plain.collect().toSet)

      // cached: second ask returns the registered tables without rewriting
      val (docs2, _) = Bucketing.llmTables(spark, dir, buckets = 4)
      assert(docs2.count() === docs.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
