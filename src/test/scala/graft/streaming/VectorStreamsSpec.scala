package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The streaming IVF ingest must agree with the batch frozen-centroid
  * assignment on the same delta (same model, same quantization) and be
  * incremental: a second relay over the same checkpoint assigns only
  * files added since the first.
  */
class VectorStreamsSpec extends SparkSpec {

  test("assignIncoming: streamed assignment == batch; re-run assigns only the delta") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    // the offline fit runs on the index side only (the s18 contract)
    val model = graft.functions.KMeans.fit(
      emb.filter(col("vec_id") % 10 =!= 0), "embedding", "vec_id",
      k = 8, iters = 2, meanDecimals = 4, distDecimals = 6)
    val delta = emb.filter(col("vec_id") % 10 === 0)

    val base = Files.createTempDirectory("vec-stream").toString
    val (src, ckpt) = (s"$base/src", s"$base/ckpt")
    delta.filter(col("vec_id") % 20 === 0).write.mode("append").parquet(src)

    val got = collection.mutable.Map[Long, Long]()
    def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      df.collect().foreach(r => got(r.getLong(0)) = r.getLong(1))
    VectorStreams.assignIncoming(spark, src, delta.schema, model, ckpt)(sink)
    val afterFirst = got.size
    assert(afterFirst > 0)

    delta.filter(col("vec_id") % 20 =!= 0).write.mode("append").parquet(src)
    VectorStreams.assignIncoming(spark, src, delta.schema, model, ckpt)(sink)

    val batch = delta
      .select(col("vec_id"), model.clusterOf(col("embedding"), 6).cast("long").as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.toMap === batch)
    assert(afterFirst < got.size) // second relay added only the new files
  }
}
