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
}
