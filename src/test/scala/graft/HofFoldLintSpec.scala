package graft

import org.apache.spark.sql.functions._

/** Board-wide lint for the t39 bug class (a nested interpreted HOF
  * fold evaluated at unbounded cardinality — 64 s until the encode
  * moved behind the distinct-word aggregate, commit a198112).
  *
  * Every registered query must either lint clean or appear in the
  * allowlist below WITH a justification. The allowlist's principled
  * line: a fold is legitimate per-row work when its input rows are
  * UNIQUE (embeddings, documents — no distinct-key encode can dedup
  * them) and the fold's inner array is dimension-/token-sized, so the
  * per-row cost is bounded; it is the t39 bug when the same key
  * recurs row after row and the fold could run once per distinct key
  * instead. A new query that flags fails here until restructured or
  * consciously allowlisted.
  */
class HofFoldLintSpec extends SparkSpec {

  /** query -> justification for running a nested fold at corpus
    * cardinality. Keep justifications honest — they are the audit. */
  private val Allowlist: Map[String, String] = Map(
    "d12_semantic_dedup" -> "k-means assign: k x dim fold per UNIQUE embedding row; no distinct-key encode exists",
    "s18_ivf_upsert" -> "IVF assign on arriving vectors: k x dim per unique embedding",
    "s19_ann_tombstones" -> "IVF assign during tombstone audit: k x dim per unique embedding",
    "m10_alignment_filter" -> "audio/text alignment cosine: dim-sized fold per unique (track, transcript) pair",
    "s15_chunk_search" -> "brute-force chunk cosine baseline BY DESIGN (the scale path is s14/s18 IVF); token-hash embedding fold is chunk-sized",
    "s25_pca_project" -> "PCA projection: k x dim fold per unique embedding row",
    "s26_binary_quant" -> "sign quantization: dim-sized fold per unique embedding row",
    "s28_ivf_bq" -> "binary-quantized IVF: dim-sized fold per unique embedding row",
    "s35_maxsim_rerank" -> "MaxSim over BROADCAST top-k candidates (limit-bounded upstream; the lint's bounded() is conservative about joins)",
    "t02_quality_score" -> "mean-token-length fold: token-array-sized per unique document",
    "t11_quality_gate" -> "t02's fold reused by the composed gate")

  test("no unaudited nested interpreted fold runs at unbounded cardinality (full board)") {
    val dir = "/root/testdata/sf0.001"
    val hits = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val fs = HofFoldLint.flags(fn(spark, dir))
      if (fs.isEmpty) None else Some(name -> fs)
    }.toMap
    val unaudited = hits.keySet -- Allowlist.keySet
    assert(unaudited.isEmpty,
      s"nested interpreted folds at unbounded cardinality without an audit entry:\n" +
        unaudited.toSeq.sorted.map(n => s"  $n: ${hits(n).mkString("; ")}").mkString("\n") +
        "\nEither restructure (encode per distinct key and join back — the t39 fix) " +
        "or allowlist WITH justification.")
    val stale = Allowlist.keySet -- hits.keySet
    assert(stale.isEmpty,
      s"allowlist entries that no longer flag (remove them): ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("the lint is red on the t39 bug shape: a DP fold per token OCCURRENCE") {
    val dir = "/root/testdata/sf0.001"
    val w = col("w")
    // the shape t39 shipped with: an expensive nested fold evaluated
    // once per corpus token occurrence, though occurrences repeat words
    val bad = Tables.documents(spark, dir)
      .select(explode(graft.functions.Exprs.tokens(col("text"))).as("w"))
      .select(aggregate(sequence(lit(1), length(w)), lit(0L),
        (acc, i) => acc + size(filter(sequence(lit(1), i), j => j % 2 === 0))).as("cost"))
    assert(HofFoldLint.flags(bad).nonEmpty, "the t39 shape must flag")

    // and the fix shape passes: the same fold behind a distinct-word
    // aggregate (vocab-sized input), occurrences joined back
    val words = Tables.documents(spark, dir)
      .select(explode(graft.functions.Exprs.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val fixed = words.select(w, aggregate(sequence(lit(1), length(w)), lit(0L),
      (acc, i) => acc + size(filter(sequence(lit(1), i), j => j % 2 === 0))).as("cost"))
    assert(HofFoldLint.flags(fixed).isEmpty, "the distinct-key encode must lint clean")
  }
}
