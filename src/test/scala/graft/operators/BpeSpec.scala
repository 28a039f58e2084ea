package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def merges(rows: Seq[(String, Long)], rounds: Int): Seq[(Int, String, String, Long)] =
    Bpe.train(rows.toDF("word", "freq"), rounds)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)

  test("hand-computed merge sequence with a count tie broken lexicographically") {
    // aaab×3: (a,a)=6, (a,b)=3; aab×2: (a,a)=2, (a,b)=2
    // r1: (a,a)=8 wins. aaab->[aa,a,b], aab->[aa,b]
    // r2: (a,b)=3 ties (aa,a)=3 -> 'a' < 'aa' picks (a,b). aaab->[aa,ab]
    // r3: (aa,ab)=3 beats (aa,b)=2
    val got = merges(Seq(("aaab", 3L), ("aab", 2L)), rounds = 3)
    assert(got === Seq((1, "a", "a", 8L), (2, "a", "b", 3L), (3, "aa", "ab", 3L)))
  }

  test("greedy left-to-right application: aaaa merges to [aa][aa], not [aa][a][a]") {
    val got = merges(Seq(("aaaa", 1L)), rounds = 2)
    assert(got === Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("vocab size: every round learns exactly one merge while pairs remain") {
    val got = merges(Seq(("interdependence", 4L), ("independent", 3L), ("dependence", 5L)),
      rounds = Bpe.Rounds)
    assert(got.size === Bpe.Rounds, "one merge per round")
    assert(got.map(_._1) === (1 to Bpe.Rounds), "rounds are sequential")
    assert(got.map(m => (m._2, m._3)).distinct.size === Bpe.Rounds,
      "a pair is never merged twice")
    // the first round picks the global max; later pairs either existed
    // then (count <= that max, merges only consume occurrences) or were
    // created by a merge (count <= the merged pair's count) — so no
    // later round can beat round 1
    assert(got.map(_._4).max === got.head._4)
  }

  test("training runs single-symbol words without pair rows (no degenerate failure)") {
    val got = merges(Seq(("a", 10L), ("bc", 1L)), rounds = 1)
    assert(got === Seq((1, "b", "c", 1L)))
  }

  test("t25 encode: token counts shrink by applied merges; the encode plan joins nothing") {
    // corpus: "aa aa ab" ×1 doc + "aa b" ×1 doc. Training (10 rounds on
    // this vocab) merges (a,a) first; doc token counts must reflect the
    // applied merges: every 'aa' word encodes to ONE symbol.
    val dir = java.nio.file.Files.createTempDirectory("t25spec").toString
    Seq((1L, "aa aa ab"), (2L, "aa b"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = graft.SparkEntry.queries("t25_bpe_encode")(spark, dir)
    val got = df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // r1 merges (a,a): "aa"->1 symbol; "ab" merges later rounds too
    // (vocab is tiny so every pair eventually merges): all words end as
    // single symbols within 10 rounds
    assert(got(1L) === ((3L, 3L)), "3 words, each fully merged to 1 token")
    assert(got(2L) === ((2L, 2L)))
    // scale claim: encoding is a projection — no join in the plan
    // (training jobs ran eagerly before the returned frame was built)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"encode must not join:\n$plan")
  }
}
