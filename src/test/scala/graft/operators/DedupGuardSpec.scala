package graft.operators

import graft.SparkSpec

/** The degenerate-LSH-bucket guard (VERDICT r2 #2): a boilerplate corpus
  * collapses into one (band, key) — or one hyperplane — bucket, and an
  * unguarded `collect_list` + pair expansion is O(n²) in that bucket. The
  * guard must (a) drop oversized buckets BEFORE any list materializes,
  * (b) leave normal buckets' output untouched, and (c) surface the drop
  * through the named `observe` metrics.
  */
class DedupGuardSpec extends SparkSpec {
  import spark.implicits._

  test("shingle LSH: mega-bucket is dropped, sub-cap buckets still pair") {
    val boiler = (0 until 2400).map(i =>
      (10000L + i, "the quick brown fox jumps over the lazy dog"))
    // 5 identical docs of OTHER text: same signature in every band, a
    // bucket of 5 << MaxBucketSize — must still yield all C(5,2) pairs.
    val small = (0 until 5).map(i => (i.toLong, "pack my box with five dozen liquor jugs"))
    val docs = (boiler ++ small).toDF("doc_id", "text")

    val cand = Dedup.candidatesFrom(Dedup.shingled(docs))
    val rows = cand.collect()

    assert(!rows.exists(r => r.getLong(0) >= 10000L || r.getLong(1) >= 10000L),
      "no pair may come from the over-cap boilerplate bucket")
    assert(rows.length === 10, "the 5 identical sub-cap docs pair C(5,2) ways")

    val m = cand.queryExecution.observedMetrics("lsh_bucket_guard")
    // every one of the B=4 band rows of each boilerplate doc sat in an
    // over-cap bucket
    assert(m.getAs[Long]("rows_in_overflow_buckets") === 2400L * 4)
    assert(m.getAs[Long]("max_bucket_rows") === 2400L)
  }

  test("embedding LSH: mega-bucket is dropped, sub-cap buckets still pair") {
    val dim = 64
    val v = Array.tabulate(dim)(d => if (d == 0) 1.0f else 0.0f)
    val negV = v.map(-_) // opposite sign pattern on every plane → disjoint bucket
    val mega = (0 until 1500).map(i => (10000L + i, v.toSeq))
    val small = (0 until 4).map(i => (i.toLong, negV.toSeq))
    val emb = (mega ++ small).toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) AS embedding")

    val pairs = Dedup.embeddingPairs(emb)
    val rows = pairs.collect()

    assert(!rows.exists(r => r.getLong(0) >= 10000L || r.getLong(1) >= 10000L),
      "no pair may come from the over-cap bucket")
    assert(rows.length === 6, "the 4 identical sub-cap vectors pair C(4,2) ways")
    assert(rows.forall(_.getDouble(2) === 1.0), "identical vectors: cosine 1")

    val m = pairs.queryExecution.observedMetrics("embedding_bucket_guard")
    assert(m.getAs[Long]("rows_in_overflow_buckets") === 1500L)
    assert(m.getAs[Long]("max_bucket_rows") === 1500L)
  }

  test("edit-distance blocks: bounded levenshtein within blocks, mega-block dropped") {
    // base text 40 chars; "near" differs by 3 edits (<= EditDistMax=8) and
    // stays in the same 16-char length band + first token; "far" differs
    // by way more than 8 edits but shares the block -> scored, filtered.
    val base = "alpha bravo charlie delta echo foxtrot"
    val near = "alpha bravo charlie delta echo foxtrXX"   // 2 subs, same len
    val far  = "alpha " + "z" * (base.length - 6)          // same tok0 + band
    val mega = (0 until 1200).map(i => (10000L + i, base)) // over-cap block? no:
    // mega shares (tok0, lenband) with base/near/far -> block of 1203 > cap
    val docs = (Seq((1L, base), (2L, near), (3L, far)) ++ mega).toDF("doc_id", "text")
    val all = Dedup.editDistancePairs(docs)
    assert(all.collect().isEmpty, "over-cap block must not pair-expand")
    val m = all.queryExecution.observedMetrics("editdist_block_guard")
    assert(m.getAs[Long]("max_block_rows") === 1203L)

    // without the mega block: (1,2) at dist 2 survives; (1,3)/(2,3) exceed
    // the bound -> bounded levenshtein returns -1 -> filtered.
    val pairs = Dedup.editDistancePairs(
      Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 2L)))
  }
}
