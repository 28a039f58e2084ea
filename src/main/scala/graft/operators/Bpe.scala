package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Exprs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE vocabulary training — the iterative highest-frequency pair merge
  * that turns a word-frequency table into a merge list (the tokenizer's
  * vocab), the last big LLM-prep primitive alongside dedup / packing /
  * quality scoring. t07 counts pair frequencies ONCE; this runs the
  * actual training loop.
  *
  * Follows the engine's iterative-algorithm contract (d07 components,
  * s06 k-means, s13 PageRank):
  *   - each round is ONE distributed aggregation (explode adjacent
  *     symbol pairs weighted by word frequency, sum per pair) — one
  *     shuffle round over the VOCABULARY table, which is orders of
  *     magnitude smaller than the corpus it came from;
  *   - the only driver traffic per round is the argmax pair — a single
  *     row (the same scalar-collect budget as k-means' k×dim means);
  *   - the merge is applied as one codegen'd string `replace` per word
  *     riding the next round's aggregation scan — the lineage grows by
  *     one projection per (fixed-count) round, so no per-round
  *     materialization is needed: each round is exactly one job;
  *   - FIXED round count + total tie-break order (count DESC, then the
  *     pair lexicographically) keep the run deterministic, which is
  *     what lets a DuckDB oracle unroll the identical ten rounds.
  *
  * Words are encoded as delimiter-wrapped symbol strings
  * (u0001 sym u0002 per symbol): applying a merge is then a plain
  * left-to-right non-overlapping `replace` of wrap(a)+wrap(b) with
  * wrap(ab) — exactly BPE's
  * greedy application order, with identical scan semantics in Spark's
  * UTF8String.replace and DuckDB's replace, so parity holds by
  * construction (including the "aaa" overlap case: one merge, not two).
  * Words are restricted to printable ASCII so the delimiters can never
  * collide with symbol bytes.
  */
object Bpe {

  private val S1 = "\u0001" // opens a symbol  (chr(1) on the oracle side)
  private val S2 = "\u0002" // closes a symbol (chr(2))

  /** Rounds are fixed so the oracle can unroll them. */
  private[graft] val Rounds = 10

  /** (word, freq) table from any (…, text) frame: whitespace tokens,
    * printable-ASCII-only (guarantees the u0001/u0002 delimiters are
    * collision-free), with occurrence counts. Shared by the batch
    * queries and the streaming vocab fold
    * ([[graft.streaming.VocabStreams]]), so both derive words under the
    * exact same filter. */
  private[graft] def wordsOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(Exprs.tokens(col("text"))).as("word"))
      .filter(col("word").rlike("^[ -~]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** The corpus-wide word table of the documents fixture. */
  private[operators] def words(s: SparkSession, dir: String): DataFrame =
    wordsOf(Tables.documents(s, dir))

  /** Decodes the wrapped-symbol string back to its symbol array. */
  private def symsOf(s: Column): Column =
    transform(filter(split(s, S2), x => x =!= lit("")),
      x => x.substr(lit(2), length(x)))

  /** Trains `rounds` BPE merges over a (word, freq) table. Returns the
    * merge table (round, pa, pb, cnt) — one row per learned merge, in
    * training order. The returned frame is driver-local by nature: a
    * vocab is vocab-sized, the distributed work happened per round. */
  def train(wordFreq: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"bpe training needs >= 1 round, got $rounds")
    val spark = wordFreq.sparkSession
    import spark.implicits._
    // (r18 note: fanning this checkpoint to full parallelism was tried
    // and reverted — the rounds are codegen-cheap over a vocab-sized
    // table, so 10 rounds × 32-task scheduling cost more than the
    // single-task compute it removed.)
    var cur = wordFreq.select(col("freq"),
      regexp_replace(col("word"), "(.)", S1 + "$1" + S2).as("s"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (k <- 1 to rounds) {
      val l = symsOf(col("s"))
      val pairs = transform(slice(l, lit(1), size(l) - 1),
        (a, i) => struct(a.as("pa"), element_at(l, i + lit(2)).as("pb")))
      val best = cur.select(col("freq"), explode(pairs).as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pa"), col("pb"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (pa, pb, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((k, pa, pb, cnt))
        // no per-round checkpoint: the lineage grows by ONE codegen
        // `replace` projection per round, so round k's aggregation
        // re-applies k cheap replaces over the initial checkpointed
        // word table — one distributed job per round instead of two
        // (the old form paid a full vocab materialization per round
        // just to truncate a linear, projection-only plan)
        cur = cur.select(col("freq"),
          replace(col("s"), lit(S1 + pa + S2 + S1 + pb + S2),
            lit(S1 + pa + pb + S2)).as("s"))
      }
    }
    merges.result().toDF("round", "pa", "pb", "cnt")
  }

  /** The oracle unrolls the fixed rounds as a chained CTE (recursive
    * CTEs forbid grouped aggregation over the recursive reference; a
    * fixed round count needs none). Each round re-derives the pair
    * counts, picks the same (cnt DESC, pa, pb) argmax, and applies the
    * same delimiter-exact replace. The merge is applied through a LEFT
    * JOIN + coalesce (the kmeansCtes empty-cluster carryover pattern):
    * if the vocabulary runs dry before the fixed round count, b$k is
    * empty and w$k must carry w$(k-1) forward unchanged — a cross join
    * would instead empty every later w table and silently zero the t25
    * encode oracle, while the Spark side skips dry rounds gracefully. */
  private def bpeChain(rounds: Int): String = {
    val perRound = (1 to rounds).map { k =>
      s"""sy$k AS (
         |  SELECT freq,
         |    list_transform(list_filter(string_split(s, chr(2)), x -> x <> ''),
         |                   x -> substr(x, 2)) AS l
         |  FROM w${k - 1}),
         |pc$k AS (
         |  SELECT pr.pa AS pa, pr.pb AS pb, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq,
         |          unnest(list_transform(range(1, len(l)),
         |                                i -> {'pa': l[i], 'pb': l[i+1]})) AS pr
         |        FROM sy$k)
         |  GROUP BY 1, 2),
         |b$k AS (SELECT pa, pb, cnt FROM pc$k ORDER BY cnt DESC, pa, pb LIMIT 1),
         |w$k AS (
         |  SELECT word, freq,
         |         coalesce(replace(s, chr(1) || b.pa || chr(2) || chr(1) || b.pb || chr(2),
         |                             chr(1) || b.pa || b.pb || chr(2)), s) AS s
         |  FROM w${k - 1} LEFT JOIN b$k b ON true)""".stripMargin
    }.mkString(",\n")
    s"""${TextAnalysis.toksCte},
       |wd AS (
       |  SELECT w AS word, count(*) AS freq
       |  FROM (SELECT unnest(t) AS w FROM toks)
       |  WHERE regexp_matches(w, '^[ -~]+$$')
       |  GROUP BY 1),
       |w0 AS (SELECT word, freq,
       |       regexp_replace(word, '(.)', chr(1) || '\\1' || chr(2), 'g') AS s
       |       FROM wd),
       |$perRound""".stripMargin
  }

  private def bpeSql(rounds: Int): String = {
    val unions = (1 to rounds)
      .map(k => s"SELECT $k AS round, pa, pb, cnt FROM b$k")
      .mkString("\nUNION ALL\n")
    s"""WITH ${bpeChain(rounds)}
       |$unions""".stripMargin
  }

  /** The encode oracle rides the same training chain: after `rounds`
    * merges, w<rounds>.s IS every word's encoded form, so per-doc token
    * counts are one join from doc tokens to the trained vocab. */
  private def encodeSql(rounds: Int): String =
    s"""WITH ${bpeChain(rounds)},
       |fx AS (
       |  SELECT doc_id, w
       |  FROM (SELECT doc_id, unnest(t) AS w FROM toks)
       |  WHERE regexp_matches(w, '^[ -~]+$$'))
       |SELECT fx.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(len(list_filter(string_split(v.s, chr(2)), x -> x <> ''))) AS BIGINT)
       |         AS n_tokens
       |FROM fx JOIN w$rounds v ON v.word = fx.w
       |GROUP BY fx.doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("t24_bpe_train", bpeSql(Rounds)) { (s, dir) =>
      train(words(s, dir), Rounds)
    },

    // Tokenizer APPLICATION — encode the corpus with the merges t24
    // learned and report per-doc BPE token counts (the feed for packing
    // t12 / curriculum t16 when budgets are in REAL tokens, not
    // whitespace words). Scale shape: the merge list is vocab-sized
    // driver data, so encoding is a PURE codegen projection — the
    // `rounds` chained replaces ride the token scan with no join and no
    // shuffle beyond the final per-doc count; the oracle instead joins
    // each doc token to the trained vocab's encoded form (same function,
    // different plan — their agreement is itself evidence the encode is
    // a pure function of the word). */
    QueryDef.sql("t25_bpe_encode", encodeSql(Rounds)) { (s, dir) =>
      perWordTokenCounts(s, dir)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("nt").as("n_tokens"))
    },

    // Tokenizer FERTILITY per language — the multilingual health metric
    // (avg BPE tokens per word): a tokenizer trained on a skewed mix
    // fragments under-represented languages into more pieces, inflating
    // their effective sequence lengths; fertility is the number a
    // tokenizer audit reads per language before committing to a vocab.
    // Rides the SAME trained merge chain as t24/t25 (one more grouping
    // of the encode projection — zero extra fit cost); languages whose
    // words the ASCII-only word filter excludes simply don't appear,
    // identically on both engines.
    QueryDef.sql("t36_bpe_fertility",
      s"""WITH ${bpeChain(Rounds)},
         |fx AS (
         |  SELECT doc_id, w
         |  FROM (SELECT doc_id, unnest(t) AS w FROM toks)
         |  WHERE regexp_matches(w, '^[ -~]+$$')),
         |enc AS (
         |  SELECT fx.doc_id,
         |         len(list_filter(string_split(v.s, chr(2)), x -> x <> '')) AS nt
         |  FROM fx JOIN w$Rounds v ON v.word = fx.w)
         |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(nt) AS BIGINT) AS n_tokens,
         |       round(sum(nt) * 1.0 / count(*), 6) AS fertility
         |FROM enc JOIN documents d USING (doc_id)
         |GROUP BY d.lang""".stripMargin) { (s, dir) =>
      perWordTokenCounts(s, dir)
        .join(Tables.documents(s, dir).select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"), sum("nt").as("n_tokens"),
          round(sum("nt") * lit(1.0) / count(lit(1)), 6).as("fertility"))
    }
  )

  /** The t25 encode projection as per-word-occurrence rows
    * (doc_id, nt): the collected vocab-sized merge list folds into a
    * chain of codegen `replace`s riding the token scan — no join, no
    * shuffle. Shared by t25 (per-doc counts) and t36 (per-lang
    * fertility). */
  private def perWordTokenCounts(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val mlist = train(words(s, dir), Rounds)
      .collect().sortBy(_.getInt(0))
    val enc0 = regexp_replace(col("w"), "(.)", S1 + "$1" + S2)
    val encoded = mlist.foldLeft(enc0) { (acc, r) =>
      val (pa, pb) = (r.getString(1), r.getString(2))
      replace(acc, lit(S1 + pa + S2 + S1 + pb + S2), lit(S1 + pa + pb + S2))
    }
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(Exprs.tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[ -~]+$"))
      .select(col("doc_id"),
        size(filter(split(encoded, S2), x => x =!= lit(""))).as("nt"))
  }
}
