package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The incrementally-maintained kNN graph must equal the batch-built
  * s17 graph over the same corpus once every vector has arrived — the
  * reverse-edge insertions are what make a growing corpus's
  * top-degree sets identical to the batch ranking — and the relay must
  * be incremental (checkpoint resume folds only new files).
  */
class GraphStreamsSpec extends SparkSpec {

  private val edgeKey = (r: org.apache.spark.sql.Row) =>
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))

  test("streamed graph == batch s17 graph after all arrivals; resume folds the delta only") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val base = Files.createTempDirectory("graph-stream").toString

    // first wave: 60% of the corpus, multiple files for a multi-batch fold
    emb.filter(col("vec_id") % 5 < 3).repartition(3)
      .write.mode("append").parquet(s"$base/src")
    var folds = 0
    val st1 = GraphStreams.maintainGraph(spark, s"$base/src", emb.schema,
      s"$base/ckpt", maxFilesPerTrigger = Some(1)) { _ => folds += 1 }
    assert(folds >= 3, s"expected a multi-batch fold, got $folds")
    assert(st1.isDefined)

    // second wave: the rest; same checkpoint, seeded with prior state
    emb.filter(col("vec_id") % 5 >= 3).write.mode("append").parquet(s"$base/src")
    var last: Array[org.apache.spark.sql.Row] = Array.empty
    GraphStreams.maintainGraph(spark, s"$base/src", emb.schema,
      s"$base/ckpt", initial = st1) { g => last = g.collect(); folds += 1 }

    val batch = graft.SparkEntry.queries("s17_knn_graph")(spark, dir)
      .collect().map(edgeKey).toSet
    assert(last.map(edgeKey).toSet === batch)
    assert(batch.nonEmpty)
  }

  test("ladderFold maintains BOTH layers: each equals its batch-built graph after all arrivals") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .localCheckpoint(true)

    // three waves through the ladder fold — incremental on both layers
    var fine: Option[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = None
    var coarse: Option[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = None
    Seq(0, 1, 2).foreach { wave =>
      val delta = emb.filter(col("vec_id") % 3 === wave)
      val (f, c) = GraphStreams.ladderFold(delta, fine, coarse)
      fine = Some(f); coarse = Some(c)
    }

    val fineGot = GraphStreams.render(fine.get._2).collect().map(edgeKey).toSet
    val fineBatch = graft.SparkEntry.queries("s17_knn_graph")(spark, dir)
      .collect().map(edgeKey).toSet
    assert(fineGot === fineBatch, "fine layer")

    val coarseGot = GraphStreams.render(coarse.get._2).collect().map(edgeKey).toSet
    val coarseBatch = graft.operators.Similarity.coarseKnnGraph(spark, dir)
      .collect().map(edgeKey).toSet
    assert(coarseGot === coarseBatch, "coarse layer")
    assert(coarseBatch.nonEmpty, "the sampled layer has edges on this fixture")
    // the promoted slice really is sparse: the coarse index holds only
    // vec_id = 1 (mod 16) members
    val members = coarse.get._1.select("vec_id").distinct()
      .collect().map(_.getLong(0))
    assert(members.nonEmpty && members.forall(_ % 16 === 1))
  }
}
