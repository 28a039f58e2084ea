package graft.operators

import graft.SparkSpec
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** s30 is hash-gated against the unrolled two-stage oracle; this spec pins
  * the REASON the layer ladder exists: at the same total round budget
  * (coarse + fine = s22's 10), descending coarse→fine must find MORE of
  * the true top-10 than the flat walk — on the larger (sf0.1, 2000-vector)
  * fixture where the flat walk's fixed budget, spent diffusing from an
  * arbitrary entry, stops reaching the query's neighborhood. This is the
  * scale story in miniature: corpus 4×, flat recall decays, hierarchical
  * holds.
  */
class HierSearchSpec extends SparkSpec {

  private def recallAt10(name: String, dir: String): (Int, Set[Long]) = {
    val emb = graft.Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val exact = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), VectorOps.cosineR(col("embedding"), col("qe")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val got = graft.SparkEntry.queries(name)(spark, dir)
      .collect().map(_.getLong(0)).toSet
    (got.intersect(exact).size, got)
  }

  test("s30 beats the flat s22 walk at an equal round budget on the 2000-vector fixture") {
    val dir = "/root/testdata/sf0.1"
    val (flat, _) = recallAt10("s22_graph_search", dir)
    val (hier, got) = recallAt10("s30_hier_graph_search", dir)
    info(s"recall@10: flat s22 = $flat/10, hierarchical s30 = $hier/10")
    assert(got.size === 10, "a full top-10 comes back")
    assert(hier > flat,
      s"the descent must beat the flat walk round-for-round: s30 $hier/10 vs s22 $flat/10")
  }

  test("s31 batched descent beats batched flat s23 in total recall@10 on the 2000-vector fixture") {
    val dir = "/root/testdata/sf0.1"
    val emb = graft.Tables.embeddings(spark, dir)
    val qb = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val exact = emb.filter(col("vec_id") >= 5).crossJoin(broadcast(qb))
      .select(col("query_id"), col("vec_id"),
        VectorOps.cosineR(col("embedding"), col("qe")).as("cos"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def totalHits(name: String): Int = {
      val got = graft.SparkEntry.queries(name)(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(got.keySet === exact.keySet, s"$name must answer every query in the batch")
      got.map { case (q, ids) => ids.intersect(exact(q)).size }.sum
    }
    val flat = totalHits("s23_batch_graph_search")
    val hier = totalHits("s31_batch_hier_search")
    info(s"batch recall@10 over 5 queries: flat s23 = $flat/50, hierarchical s31 = $hier/50")
    assert(hier > flat,
      s"the batched descent must beat the batched flat walk: s31 $hier/50 vs s23 $flat/50")
  }

  test("s30 stays at full recall on the small fixture the flat walk already handles") {
    val dir = "/root/testdata/sf0.001"
    val (hier, got) = recallAt10("s30_hier_graph_search", dir)
    info(s"recall@10 on sf0.001: $hier/10")
    assert(got.size === 10)
    // the gate mirrors s22's (>= 5 there): the ladder must never LOSE
    // recall where the flat budget is already sufficient
    assert(hier >= 5, s"recall@10 = $hier/10")
  }
}
