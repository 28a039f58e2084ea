package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** s34's equivalence contract: applying the compaction flag must be
  * invisible to every tombstone-filtered search and must leave
  * unflagged lists byte-identical — compaction is a layout rewrite,
  * never a semantic change.
  */
class CompactIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Cluster-correlated delete log (s34's convention): even cells lose
    * every third vector on top of the uniform %7 churn — the skew that
    * flags SOME lists while others idle, exercising both branches. */
  private def tombPred = col("vec_id") % 7 === 0 ||
    (col("cluster") % 2 === 0 && col("vec_id") % 3 === 0)

  /** The IVF index s05/s07/s16 search over, with a cluster-correlated
    * delete log. */
  private lazy val fixture: (DataFrame, DataFrame, DataFrame) = {
    val emb = Tables.embeddings(spark, dir)
    val cent = Similarity.labelCentroids(emb)
    val assigned = Similarity.ivfAssigned(emb, cent)
      .withColumn("cluster", col("clabel").cast("long")).drop("clabel")
      .localCheckpoint(true)
    val tomb = assigned.filter(tombPred).select("vec_id")
    (assigned, tomb, cent)
  }

  /** Tombstone-filtered nprobe-2 probe (the s07/s16 shape) over an
    * arbitrary index relation: searches anti-join the delete log —
    * identical semantics pre- and post-compaction by construction. */
  private def search(index: DataFrame, tomb: DataFrame, cent: DataFrame,
      extraFilter: org.apache.spark.sql.Column = lit(true)): Seq[(Long, Double)] = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val top2 = cent.crossJoin(broadcast(q))
      .select(col("clabel").as("cluster"),
        VectorOps.cosineR(col("cvec"), col("qe")).as("qcos"))
      .orderBy(col("qcos").desc, col("cluster")).limit(2).select("cluster")
    index.join(broadcast(top2), Seq("cluster"))
      .join(broadcast(tomb.withColumnRenamed("vec_id", "__t")),
        col("vec_id") === col("__t"), "left_anti")
      .filter(col("vec_id") =!= 0 && extraFilter)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), VectorOps.cosineR(col("embedding"), col("qe")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("flagged lists are rewritten minus tombstones; unflagged lists are byte-identical") {
    val (assigned, tomb, _) = fixture
    val compacted = Similarity.compactIndex(assigned, tomb).localCheckpoint(true)

    val flags = assigned.withColumn("dead", tombPred)
      .groupBy("cluster")
      .agg((lit(4) * sum(when(col("dead"), 1L).otherwise(0L)) > count(lit(1)))
        .as("due"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags.values.exists(identity),
      "fixture must flag at least one list or the test is vacuous")
    assert(!flags.values.forall(identity),
      "fixture must leave at least one list unflagged or the pass-through is untested")

    def members(df: DataFrame): Map[Long, Set[Long]] =
      df.select("cluster", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (c, rs) => c -> rs.map(_.getLong(1)).toSet }

    val pre = members(assigned)
    val post = members(compacted)
    val tombIds = tomb.collect().map(_.getLong(0)).toSet
    for ((c, ids) <- pre) {
      if (flags(c)) assert(post.getOrElse(c, Set.empty) === ids.diff(tombIds),
        s"flagged list $c must drop exactly its tombstoned members")
      else assert(post(c) === ids, s"unflagged list $c must pass through untouched")
    }
    // rewritten lists report dead = 0 (the s29-style health card)
    val deadAfter = compacted.withColumn("dead", tombPred)
      .groupBy("cluster").agg(sum(when(col("dead"), 1L).otherwise(0L)).as("nd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((c, due) <- flags if due)
      assert(deadAfter.getOrElse(c, 0L) === 0L, s"rewritten list $c must have dead=0")
  }

  test("tombstone-filtered searches are byte-identical over the original and compacted index") {
    val (assigned, tomb, cent) = fixture
    val compacted = Similarity.compactIndex(assigned, tomb).localCheckpoint(true)
    // the s07 multiprobe shape and the s16 filtered shape (s05's single
    // probe is the s07 plan with nprobe=1 — covered by the same join)
    assert(search(assigned, tomb, cent) === search(compacted, tomb, cent),
      "multiprobe search must not observe the rewrite")
    assert(search(assigned, tomb, cent, col("vec_id") % 2 === 0)
      === search(compacted, tomb, cent, col("vec_id") % 2 === 0),
      "filtered search must not observe the rewrite")
  }

  test("the index lifecycle composes with the snapshot store: compaction commits as a version") {
    val (assigned, tomb, cent) = fixture
    val store = java.nio.file.Files
      .createTempDirectory("ann-versioned").toString + "/index"
    // serving index at version 0; the maintenance pass commits the
    // compacted layout as version 1 — a searcher mid-probe on v0 races
    // nothing, and a crashed rewrite would leave v0 the newest version
    // (VersionedTableSpec's contract; here we pin the SEARCH semantics)
    VersionedTable.commit(spark, store, assigned)
    VersionedTable.commit(spark, store,
      Similarity.compactIndex(assigned, tomb))

    val live = VersionedTable.read(spark, store)
    assert(search(assigned, tomb, cent) === search(live, tomb, cent),
      "search over the committed compacted version must equal pre-compaction")
    // time travel: the pre-compaction index is byte-exact, so an
    // audit can re-run any historical probe
    val v0 = VersionedTable.read(spark, store, asOf = Some(0L))
    assert(v0.count() === assigned.count())
    assert(search(v0, tomb, cent) === search(assigned, tomb, cent))
  }
}
