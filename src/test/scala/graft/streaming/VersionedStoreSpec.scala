package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The durability seam both streaming folds stand on: a crash mid-write
  * must never surface as a committed version, leftover temp state must
  * not block the retry, and commits must be first-writer-wins.
  */
class VersionedStoreSpec extends SparkSpec {

  test("a simulated crash mid-write leaves no committed version and does not block the retry") {
    val dir = Files.createTempDirectory("vstore").toString + "/store"
    val df = spark.range(5).select(col("id"))

    // simulate a crash: the temp dir exists (half-written), no rename
    df.write.parquet(s"$dir/.tmp-7")
    assert(VersionedStore.versions(spark, dir).isEmpty,
      "an unrenamed temp write is invisible")

    // the retry overwrites the leftover temp and commits atomically
    assert(VersionedStore.commit(spark, dir, 7L, df))
    assert(VersionedStore.versions(spark, dir) === Seq(7L))
    assert(spark.read.parquet(VersionedStore.path(dir, 7L).toString).count() === 5)

    // second delivery of the same batch: first-writer-wins, no rewrite
    assert(!VersionedStore.commit(spark, dir, 7L, spark.range(99).toDF("id")))
    assert(spark.read.parquet(VersionedStore.path(dir, 7L).toString).count() === 5,
      "the committed version is immutable under redelivery")

    // prune removes exactly the named versions
    assert(VersionedStore.commit(spark, dir, 8L, df))
    VersionedStore.prune(spark, dir, Seq(7L))
    assert(VersionedStore.versions(spark, dir) === Seq(8L))
  }
}
