package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The merged-footer-schema cache behind [[PartitionedTable]] reads:
  * one footer-merge job per distinct (path set, table epoch) per JVM,
  * bit-identical to `mergeSchema=true`, byte-bounded, and invalidated
  * by this JVM's write/vacuum paths — a re-minted `batch=N` dir with a
  * DIFFERENT schema (restore→vacuum→rewrite, or a test deleting and
  * recreating a table dir) must never serve the stale cached one. */
class SchemaCacheSpec extends SparkSpec {

  private def freshStore(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def table(n: Int) = spark.range(n).select(
    col("id").as("k"),
    concat(lit("p"), (col("id") % 2).cast("string")).as("part"),
    (col("id") * 10).as("v"))

  test("a re-read is a cache HIT (no second footer-merge job)") {
    val dir = freshStore("graftsc")
    PartitionedTable.commit(spark, dir, table(100), "part")
    PartitionedTable.read(spark, dir).collect(): Unit
    val misses0 = PartitionedTable.mergedSchemaCacheMisses
    PartitionedTable.read(spark, dir).collect(): Unit
    assert(PartitionedTable.mergedSchemaCacheMisses === misses0,
      "the second read of an unchanged table must hit the schema cache")
  }

  test("a re-minted version dir with a DIFFERENT schema never serves the stale cached one") {
    val dir = freshStore("graftscre")
    PartitionedTable.commit(spark, dir, table(10), "part") // batch=0, 3 cols
    assert(PartitionedTable.read(spark, dir).columns.toSeq ===
      Seq("k", "part", "v"))
    // delete + recreate the SAME dir with an extra column: the new
    // commit re-mints the same __part=*/batch=0 paths
    graft.streaming.VersionedStore.fs(spark, dir)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    PartitionedTable.commit(spark, dir,
      table(10).withColumn("extra", col("k") + 1000), "part")
    val re = PartitionedTable.read(spark, dir)
    assert(re.columns.contains("extra"),
      s"stale cached schema served after re-mint: ${re.columns.mkString(",")}")
    assert(re.select(sum("extra")).head.getLong(0) === 10045L,
      "the new column must carry VALUES, not stale-schema null-fill")
  }

  test("restore then vacuum then rewrite: the re-minted batch path reads the NEW schema") {
    import spark.implicits._
    val dir = freshStore("graftscrv")
    PartitionedTable.commit(spark, dir, table(10), "part") // v0
    PartitionedTable.merge(spark, dir,
      Seq((3L, "p1", 999L, "upsert")).toDF("k", "part", "v", "op"),
      "k", "part") // v1 re-writes p1
    PartitionedTable.read(spark, dir).collect(): Unit // cache v1's paths
    PartitionedTable.restore(spark, dir, 0L) // v2 = v0's content
    PartitionedTable.vacuum(spark, dir, keep = 1) // drops v0/v1 + orphans
    // rewrite p1 WITH a new column: its store may re-mint a dropped
    // version id under the same path
    PartitionedTable.merge(spark, dir,
      Seq((3L, "p1", 7L, "upsert", "tag")).toDF("k", "part", "v", "op", "w"),
      "k", "part", allowSchemaEvolution = true)
    val re = PartitionedTable.read(spark, dir)
    assert(re.columns.contains("w"),
      s"stale schema after restore+vacuum+rewrite: ${re.columns.mkString(",")}")
    assert(re.filter(col("k") === 3).select("w").head.getString(0) === "tag")
  }

  test("byte-bounded LRU: many distinct path sets never accrete past the bound; evicted entries re-merge identically") {
    val dir = freshStore("graftscev")
    PartitionedTable.commit(spark, dir, table(100), "part")
    val prevMax = PartitionedTable.mergedSchemaCacheMaxBytes
    PartitionedTable.mergedSchemaCacheMaxBytes = 1024L
    try {
      val stores = (0 until 12).map { i =>
        val d = freshStore(s"graftscev$i")
        PartitionedTable.commit(spark, d, table(10), "part")
        PartitionedTable.read(spark, d).collect(): Unit
        d
      }
      assert(PartitionedTable.mergedSchemaCacheEntries <= 8,
        s"entries must evict under the byte bound: " +
          s"${PartitionedTable.mergedSchemaCacheEntries}")
      // an evicted entry re-merges (a MISS) with identical results
      val first = stores.head
      val again = PartitionedTable.read(spark, first)
        .orderBy("k").collect().map(_.toString).toSeq
      assert(again.size === 10)
    } finally PartitionedTable.mergedSchemaCacheMaxBytes = prevMax
  }

  test("cached-schema reads are bit-identical to mergeSchema=true on an EVOLVED table") {
    import spark.implicits._
    val dir = freshStore("graftscbit")
    PartitionedTable.commit(spark, dir, table(40), "part")
    PartitionedTable.merge(spark, dir,
      Seq((1L, "p1", 11L, "upsert", 1.5), (2L, "p0", 22L, "upsert", 2.5))
        .toDF("k", "part", "v", "op", "score"),
      "k", "part", allowSchemaEvolution = true)
    // cold read = the mergeSchema=true footer pass; warm read = the
    // cached-schema declared read. Same rows, same schema, bit for bit.
    val cold = PartitionedTable.read(spark, dir)
    val coldRows = cold.orderBy("k").collect().map(_.toString).toSeq
    val coldSchema = cold.schema
    val warm = PartitionedTable.read(spark, dir)
    assert(warm.schema === coldSchema)
    assert(warm.orderBy("k").collect().map(_.toString).toSeq === coldRows)
    // evolved column: touched rows carry values, untouched null-fill
    assert(cold.filter(col("k") === 1).select("score").head.getDouble(0)
      === 1.5)
    assert(cold.filter(col("k") === 5).select("score").head.isNullAt(0)
      || cold.filter(col("k") === 5).select("score").head.get(0) == null)
  }
}
