package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}

/** The incrementally-folded dataset card must equal the batch t28 card
  * on the same corpus — by merge algebra (min-merge for dup firsts,
  * additive counters), not arrival order — and must actually fold
  * incrementally (one card per micro-batch, totals monotone).
  */
class CardStreamsSpec extends SparkSpec {

  private val cardKey = (r: org.apache.spark.sql.Row) =>
    (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))

  test("streamed card == batch t28 card; folds once per micro-batch with monotone totals") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "text")
    val base = Files.createTempDirectory("card-stream").toString
    // several files so maxFilesPerTrigger=1 forces a multi-batch fold
    docs.repartition(4).write.parquet(s"$base/src")

    val cards = collection.mutable.ArrayBuffer[Array[org.apache.spark.sql.Row]]()
    CardStreams.cardIncremental(spark, s"$base/src", docs.schema,
      s"$base/ckpt", maxFilesPerTrigger = Some(1)) { card =>
      cards += card.collect()
    }

    assert(cards.size >= 3, s"expected a multi-batch fold, got ${cards.size} batches")
    // totals only grow as batches fold in
    val allDocs = cards.map(_.find(_.getString(0) == "ALL").get.getLong(1)).toSeq
    assert(allDocs === allDocs.sorted, s"ALL n_docs not monotone: $allDocs")

    val batchCard = graft.SparkEntry.queries("t28_corpus_card")(spark, dir)
      .collect().map(cardKey).toSet
    assert(cards.last.map(cardKey).toSet === batchCard)
    assert(batchCard.nonEmpty)
  }

  test("resume from persisted state: a second relay folds only the delta and agrees with one-shot") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "text")
    val base = Files.createTempDirectory("card-stream-resume").toString
    docs.filter(col("doc_id") % 2 === 0).write.mode("append").parquet(s"$base/src")

    var n = 0
    val st1 = CardStreams.cardIncremental(spark, s"$base/src", docs.schema,
      s"$base/ckpt") { _ => n += 1 }
    val afterFirst = n

    // drop the rest; same checkpoint → only new files fold in, seeded
    // with the prior state
    docs.filter(col("doc_id") % 2 =!= 0).write.mode("append").parquet(s"$base/src")
    var last: Array[org.apache.spark.sql.Row] = Array.empty
    CardStreams.cardIncremental(spark, s"$base/src", docs.schema,
      s"$base/ckpt", initial = Some(st1)) { card => last = card.collect(); n += 1 }
    assert(afterFirst >= 1 && n > afterFirst)

    val batchCard = graft.SparkEntry.queries("t28_corpus_card")(spark, dir)
      .collect().map(cardKey).toSet
    assert(last.map(cardKey).toSet === batchCard)
  }
}
