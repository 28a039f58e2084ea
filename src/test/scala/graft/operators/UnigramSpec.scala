package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The unigram-LM trainer's structural invariants — the properties the
  * hash gate can't express: segmentations must reconstruct their words
  * byte-exactly, the prune must respect its budgets while keeping every
  * character, and the t39 fertility table must be directly comparable
  * with BPE's t36.
  */
class UnigramSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("the final vocab keeps every character, respects the multi-char budget, and sums to ~1") {
    val (scored, vocab) = Unigram.train(spark, Unigram.words(spark, dir))
    val rows = scored.collect()
    val pieces = rows.map(_.getString(0)).toSet

    val corpusChars = Unigram.words(spark, dir)
      .select(explode(split(col("word"), "")).as("c"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(corpusChars.subsetOf(pieces),
      "every corpus character must survive every prune")
    assert(pieces.count(_.length > 1) <= Unigram.KeepPerRound.last,
      "multi-char pieces exceed the final prune budget")
    assert(vocab.keySet === pieces)
    // quantized probabilities still form a distribution (up to the
    // 6-decimal rounding of each term)
    val mass = vocab.values.sum
    assert(mass > 0.99 && mass < 1.01, s"probability mass $mass")
  }

  test("every word's Viterbi segmentation reconstructs the word byte-exactly") {
    val wf = Unigram.words(spark, dir)
    val (_, vocab) = Unigram.train(spark, wf)
    val vmap = typedLit(vocab)
    val seg = wf.select(col("word"),
      Unigram.piecesCol(col("word"), Unigram.dpCol(col("word"), vmap)).as("ps"))
    val bad = seg
      // pieces are emitted last-to-first: reversed concat must equal the word
      .withColumn("rebuilt", concat_ws("", reverse(col("ps"))))
      .filter(col("rebuilt") =!= col("word"))
    assert(bad.count() === 0, {
      val ex = bad.select("word", "rebuilt").take(3).mkString("; ")
      s"segmentations fail to reconstruct: $ex"
    })
    // and no segment can be longer than Lmax or absent from the vocab
    val pieces = seg.select(explode(col("ps")).as("p")).distinct()
      .collect().map(_.getString(0))
    assert(pieces.forall(p => p.nonEmpty && p.length <= Unigram.Lmax))
    assert(pieces.forall(vocab.contains))
  }

  test("t39 unigram fertility is comparable with t36 BPE fertility: same langs, same word counts") {
    val uni = graft.SparkEntry.queries("t39_unigram_fertility")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val bpe = graft.SparkEntry.queries("t36_bpe_fertility")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(uni.keySet === bpe.keySet,
      "both tokenizers must measure the same language slice")
    // The per-word comparison below is valid ONLY while the two corpus
    // slices coincide: t39 excludes words longer than MaxWordLen (the
    // Viterbi DP is quadratic in word length) and t36 does not. Verify
    // that precondition against the fixture itself — if a longer word
    // ever appears, n_words diverges BY DESIGN and this equality (not
    // the engines) is what must be relaxed to the <=MaxWordLen subset.
    import org.apache.spark.sql.functions.{length => slen}
    val overCap = graft.operators.Bpe.words(spark, dir)
      .filter(slen(col("word")) > Unigram.MaxWordLen).count()
    assert(overCap === 0,
      s"fixture grew $overCap words over MaxWordLen — t36/t39 slices now diverge")
    uni.foreach { case (lang, (nWords, fert)) =>
      assert(nWords === bpe(lang)._1, s"word count mismatch for $lang")
      assert(fert >= 1.0, s"fertility below 1 for $lang")
    }
  }
}
