package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Exprs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (SentencePiece-style) — the second
  * tokenizer family alongside BPE (t24/t25/t36), so the fertility
  * comparison t36 exists to serve has two real contestants.
  *
  * The fit is the hard-EM (Viterbi-EM) variant of the unigram LM:
  *
  *   1. SEED: vocabulary = every single character plus the top
  *      [[SeedMulti]] substrings of length 2..[[Lmax]] by freq-weighted
  *      occurrence count; initial piece probabilities proportional to
  *      those counts.
  *   2. E-STEP: segment every word by max-product Viterbi under the
  *      current probabilities (DP over word positions; candidate pieces
  *      are the ≤[[Lmax]]-char suffixes at each position; ties prefer
  *      the longer piece), and count freq-weighted piece usage along
  *      the argmax path.
  *   3. M-STEP + PRUNE: keep all single characters (so every word stays
  *      segmentable) plus the top-k used multi-char pieces by
  *      (usage DESC, piece ASC); re-estimate probabilities from usage
  *      with a +1 floor on characters (an unused character must keep
  *      nonzero mass). k shrinks per round ([[KeepPerRound]]) — the
  *      prune half of SentencePiece's EM+prune loop, with usage as the
  *      (deterministic, integer) stand-in for likelihood-loss ranking.
  *
  * Engine-parity contract (the s06/t24/s13 iterative discipline):
  * probabilities are QUANTIZED to 6 decimals at every round boundary,
  * and the Viterbi objective is the max PRODUCT of those quantized
  * probabilities — products and comparisons of identical doubles are
  * bit-identical on both engines, so no log-space drift exists at all
  * (IEEE multiply is exactly rounded; ln is not). The DuckDB oracle
  * unrolls the fixed rounds, the per-position DP, and the backtrack as
  * chained CTEs over the same quantized tables.
  *
  * Scale shape: the corpus contributes ONE groupBy (the word-frequency
  * table); the EM loop runs entirely on that vocabulary-sized table —
  * the Viterbi DP is a per-word projection (the collected vocab rides
  * along as a ≤(chars+[[SeedMulti]])-entry map literal), each round is
  * one shuffle over the word table, and the only driver traffic is the
  * vocab-sized score table per round. The DP fold itself is an
  * INTERPRETED higher-order expression (HOF lambdas don't
  * whole-stage-codegen), which is fine exactly because it only ever
  * runs over the distinct-word table — anything corpus-sized joins the
  * encoded word table instead of re-running the DP (t39).
  * Words are capped at [[MaxWordLen]] chars (with the printable-ASCII
  * filter, applied identically on both engines) so the oracle's DP
  * unroll depth is fixed; at corpus scale the cap also bounds DP state.
  */
object Unigram {

  /** Longest candidate piece. */
  private[operators] val Lmax = 4

  /** Multi-char seeds kept at initialization. */
  private[operators] val SeedMulti = 32

  /** Multi-char pieces surviving each round's prune (2 EM rounds). */
  private[operators] val KeepPerRound = Seq(24, 16)

  /** DP unroll depth: words longer than this are excluded (both
    * engines), exactly like the printable-ASCII word filter. */
  private[graft] val MaxWordLen = 12

  private[operators] def words(s: SparkSession, dir: String): DataFrame =
    Bpe.words(s, dir).filter(length(col("word")) <= MaxWordLen)

  /** Every substring of length 1..Lmax of `w`, with multiplicity. */
  private def allPieces(w: Column): Column =
    flatten(transform(sequence(lit(1), length(w)), i =>
      transform(sequence(lit(1), least(lit(Lmax), length(w) - i + lit(1))),
        l => w.substr(i, l))))

  /** Seed probabilities: chars ∪ top-SeedMulti substrings, p ∝ count,
    * quantized to 6. Driver traffic: the vocab-sized score table. */
  private def seedScores(wordFreq: DataFrame): Map[String, Double] = {
    val pieces = wordFreq
      .select(col("freq"), explode(allPieces(col("word"))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
      .localCheckpoint(true) // reused: chars, the top-k cut, the total
    val chars = pieces.filter(length(col("piece")) === 1)
    val multi = pieces.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(SeedMulti)
    val v0 = chars.unionByName(multi).localCheckpoint(true)
    val tot = v0.agg(sum("cnt").as("c"))
    v0.crossJoin(broadcast(tot))
      .select(col("piece"), round(col("cnt").cast("double") / col("c"), 6).as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  /** Max-product Viterbi DP: position j's entry is the best product over
    * segmentations of word[1..j] plus the length of its last piece
    * (the backpointer). Entry 1 (position 0) is the empty prefix. Ties
    * prefer the longer piece — array_max on (b, l) structs, the same
    * (b DESC, l DESC) order the oracle's row_number uses. */
  private[operators] def dpCol(word: Column, vocab: Column): Column =
    aggregate(sequence(lit(1), length(word)),
      array(struct(lit(1.0).as("b"), lit(0).as("l"))),
      (acc, j) => {
        val cands = transform(sequence(lit(1), least(lit(Lmax), j)), len =>
          struct((element_at(acc, j - len + lit(1)).getField("b") *
            element_at(vocab, word.substr(j - len + lit(1), len))).as("b"),
            len.as("l")))
        val best = array_max(filter(cands, c => c.getField("b").isNotNull))
        concat(acc, array(best))
      })

  /** Backtrack the DP: the argmax path's pieces, last-to-first. Each
    * fold step consumes one piece, and the path has at most length(word)
    * pieces, so folding over the position sequence is a bounded
    * while-loop. */
  private[operators] def piecesCol(word: Column, dp: Column): Column =
    aggregate(sequence(lit(1), length(word)),
      struct(length(word).as("j"), array().cast("array<string>").as("ps")),
      (acc, _) => {
        val j = acc.getField("j")
        val bp = element_at(dp, j + lit(1)).getField("l")
        when(j > lit(0),
          struct((j - bp).as("j"),
            concat(acc.getField("ps"),
              array(word.substr(j - bp + lit(1), bp))).as("ps")))
          .otherwise(acc)
      }).getField("ps")

  /** E-step: freq-weighted piece usage along every word's argmax path. */
  private def usageDf(wordFreq: DataFrame, vocab: Map[String, Double]): DataFrame = {
    val vmap = typedLit(vocab)
    wordFreq
      .select(col("freq"),
        explode(piecesCol(col("word"), dpCol(col("word"), vmap))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("u"))
  }

  /** M-step + prune: chars (always, usage-floored +1) ∪ top-`keepMulti`
    * used multi-char pieces; p = usage'/total quantized to 6. Computed
    * distributedly so the quantization goes through the engine's own
    * round, then collected vocab-sized for the next round's map literal. */
  private def rescore(
      s: SparkSession,
      usage: DataFrame,
      vocab: Map[String, Double],
      keepMulti: Int): DataFrame = {
    import s.implicits._
    val u = usage.localCheckpoint(true) // reused: chars join, top-k, total
    val chars = vocab.keys.filter(_.length == 1).toSeq.sorted.toDF("piece")
      .join(u, Seq("piece"), "left").na.fill(0L, Seq("u"))
    val multi = u.filter(length(col("piece")) > 1)
      .orderBy(col("u").desc, col("piece")).limit(keepMulti)
    // no checkpoint: both consumers (total + final select) are
    // vocab-sized scans over the already-checkpointed `u` — cheaper to
    // recompute than to pay a materialization job per round
    val kept = chars.unionByName(multi)
    val uS = col("u") + when(length(col("piece")) === 1, 1L).otherwise(0L)
    val tot = kept.agg(sum(uS).as("t"))
    kept.crossJoin(broadcast(tot))
      .select(col("piece"), col("u").cast("long").as("usage"),
        round(uS.cast("double") / col("t"), 6).as("p"))
  }

  /** The full fit: returns the final scored vocab frame
    * (piece, usage, p) and its collected map (for the encode path). */
  private[graft] def train(
      s: SparkSession, wordFreq: DataFrame): (DataFrame, Map[String, Double]) = {
    // fan the word table to full parallelism and materialize it ONCE:
    // the Viterbi E-step is an interpreted HOF fold — expensive per
    // row — and the word table arrives as a byte-tiny aggregate output
    // that AQE coalesces to ONE partition, so without this every EM
    // round's DP ran single-threaded AND re-derived the word table
    // from the corpus (seed + one derivation per round). Callers that
    // already materialized (t39 shares its frame with the encode pass)
    // are passed through.
    val wf = wordFreq.queryExecution.analyzed match {
      case _: org.apache.spark.sql.execution.LogicalRDD => wordFreq
      case _ => wordFreq
        .repartition(s.sparkContext.defaultParallelism)
        .localCheckpoint(true)
    }
    var vocab = seedScores(wf)
    var scored: DataFrame = null
    for (keep <- KeepPerRound) {
      scored = rescore(s, usageDf(wf, vocab), vocab, keep)
        .localCheckpoint(true) // round boundary: both consumers re-read
      vocab = scored.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    }
    (scored, vocab)
  }

  // ---------------------------------------------------------------- oracle

  /** Shared word table + seed vocab CTEs (v0). */
  private def seedCtes: String =
    s"""${TextAnalysis.toksCte},
       |wd AS MATERIALIZED (
       |  SELECT w AS word, count(*) AS freq
       |  FROM (SELECT unnest(t) AS w FROM toks)
       |  WHERE regexp_matches(w, '^[ -~]+$$') AND len(w) <= $MaxWordLen
       |  GROUP BY 1),
       |pc AS MATERIALIZED (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT p.freq, substr(p.word, p.i, l.l) AS piece
       |    FROM (SELECT word, freq, unnest(range(1, len(word)+1)) AS i FROM wd) p
       |    JOIN (SELECT unnest(range(1, ${Lmax + 1})) AS l) l
       |      ON p.i + l.l - 1 <= len(p.word))
       |  GROUP BY 1),
       |v0m AS (SELECT piece, cnt FROM pc WHERE len(piece) > 1
       |        ORDER BY cnt DESC, piece LIMIT $SeedMulti),
       |v0all AS MATERIALIZED (SELECT piece, cnt FROM pc WHERE len(piece) = 1
       |          UNION ALL SELECT piece, cnt FROM v0m),
       |c0 AS (SELECT sum(cnt) AS c FROM v0all),
       |v0 AS MATERIALIZED (
       |  SELECT piece, round(CAST(cnt AS DOUBLE) / c, 6) AS p FROM v0all, c0)""".stripMargin

  /** Viterbi DP + backtrack CTEs for chain `r` against vocab `v<r-1>`:
    * dp<r>_0..MaxWordLen accumulate (word, j, best product, backpointer
    * length), bt<r>_1..MaxWordLen walk the argmax path emitting pieces. */
  private def vitChain(r: Int): String = {
    val dp = (1 to MaxWordLen).map { k =>
      s"""dp${r}_$k AS MATERIALIZED (
         |  SELECT word, freq, j, b, bp FROM dp${r}_${k - 1}
         |  UNION ALL
         |  SELECT word, freq, j, b, bp FROM (
         |    SELECT w.word, w.freq, $k AS j, d.b * v.p AS b, l.l AS bp,
         |           row_number() OVER (PARTITION BY w.word
         |                              ORDER BY d.b * v.p DESC, l.l DESC) AS rk
         |    FROM wd w
         |    JOIN (SELECT unnest(range(1, ${Lmax + 1})) AS l) l ON l.l <= $k
         |    JOIN dp${r}_${k - 1} d ON d.word = w.word AND d.j = $k - l.l
         |    JOIN v${r - 1} v ON v.piece = substr(w.word, $k - l.l + 1, l.l)
         |    WHERE len(w.word) >= $k)
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    val bt = (1 to MaxWordLen).map { k =>
      s"""bt${r}_$k AS MATERIALIZED (
         |  SELECT b.word, b.freq, b.j - d.bp AS j,
         |         substr(b.word, b.j - d.bp + 1, d.bp) AS piece
         |  FROM bt${r}_${k - 1} b
         |  JOIN dp${r}_$MaxWordLen d ON d.word = b.word AND d.j = b.j
         |  WHERE b.j > 0)""".stripMargin
    }.mkString(",\n")
    s"""dp${r}_0 AS MATERIALIZED (SELECT word, freq, 0 AS j, CAST(1.0 AS DOUBLE) AS b, 0 AS bp FROM wd),
       |$dp,
       |bt${r}_0 AS MATERIALIZED (SELECT word, freq, len(word) AS j FROM wd),
       |$bt""".stripMargin
  }

  private def piecesUnion(r: Int): String =
    (1 to MaxWordLen).map(k => s"SELECT word, freq, piece FROM bt${r}_$k")
      .mkString(" UNION ALL ")

  /** One EM round: usage over chain `r`, then prune + rescore into v<r>. */
  private def roundCtes(r: Int, keep: Int): String =
    s"""${vitChain(r)},
       |us$r AS MATERIALIZED (SELECT piece, CAST(sum(freq) AS BIGINT) AS u
       |         FROM (${piecesUnion(r)}) GROUP BY 1),
       |vk$r AS MATERIALIZED (
       |  SELECT v.piece, coalesce(u.u, 0) AS u
       |  FROM v${r - 1} v LEFT JOIN us$r u USING (piece)
       |  WHERE len(v.piece) = 1
       |  UNION ALL
       |  SELECT piece, u FROM (
       |    SELECT piece, u FROM us$r WHERE len(piece) > 1
       |    ORDER BY u DESC, piece LIMIT $keep)),
       |tot$r AS (SELECT sum(u + CASE WHEN len(piece) = 1 THEN 1 ELSE 0 END) AS t
       |          FROM vk$r),
       |v$r AS MATERIALIZED (
       |  SELECT piece, CAST(u AS BIGINT) AS u,
       |         round(CAST(u + CASE WHEN len(piece) = 1 THEN 1 ELSE 0 END AS DOUBLE) / t, 6) AS p
       |  FROM vk$r, tot$r)""".stripMargin

  private def trainChain: String = {
    val rounds = KeepPerRound.zipWithIndex
      .map { case (keep, i) => roundCtes(i + 1, keep) }.mkString(",\n")
    s"""$seedCtes,
       |$rounds""".stripMargin
  }

  private val R = KeepPerRound.size // final vocab CTE is v<R>

  private def trainSql: String =
    s"""WITH $trainChain
       |SELECT piece, u AS usage, p FROM v$R""".stripMargin

  /** Fertility rides one more Viterbi chain against the FINAL vocab —
    * the t36 harness SHAPE (lang, n_words, n_tokens, fertility), so BPE
    * and unigram health metrics land in joinable tables. The corpus
    * SLICES differ by construction whenever a word exceeds
    * [[MaxWordLen]]: t39 caps occurrence length (the DP is quadratic in
    * word length) while t36 does not, so a strict per-word
    * apples-to-apples comparison holds only on the ≤[[MaxWordLen]]
    * subset — `UnigramSpec` pins where the slices coincide and where
    * they diverge. */
  private def fertilitySql: String =
    s"""WITH $trainChain,
       |${vitChain(R + 1)},
       |wnt AS (SELECT word, CAST(count(*) AS BIGINT) AS nt
       |        FROM (${piecesUnion(R + 1)}) GROUP BY 1),
       |fx AS (SELECT doc_id, w
       |       FROM (SELECT doc_id, unnest(t) AS w FROM toks)
       |       WHERE regexp_matches(w, '^[ -~]+$$') AND len(w) <= $MaxWordLen),
       |enc AS (SELECT fx.doc_id, wnt.nt FROM fx JOIN wnt ON wnt.word = fx.w)
       |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(nt) AS BIGINT) AS n_tokens,
       |       round(sum(nt) * 1.0 / count(*), 6) AS fertility
       |FROM enc JOIN documents d USING (doc_id)
       |GROUP BY d.lang""".stripMargin

  // The encode chain reads v<R>, so vitChain(R + 1) needs the final
  // vocab under that name with a `p` column — which v<R> already has.

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql("t38_unigram_train", trainSql) { (s, dir) =>
      train(s, words(s, dir))._1
    },

    // Unigram fertility per language in t36's harness shape — the two
    // tokenizer families' health metrics land in joinable tables. NOTE
    // the slice caveat on fertilitySql: words longer than MaxWordLen are
    // excluded here but counted by t36, so n_words can diverge between
    // the two at scale factors whose corpus contains such words.
    QueryDef.sql("t39_unigram_fertility", fertilitySql) { (s, dir) =>
      // materialized + fanned HERE so the trainer (which passes
      // LogicalRDDs through) and the encode DP below share ONE
      // parallel word table instead of re-deriving it serially
      val wf = words(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
        .localCheckpoint(true)
      val (_, vocab) = train(s, wf)
      // Encode per DISTINCT word, not per occurrence: the Viterbi DP is
      // an interpreted higher-order-function fold (HOF lambdas don't
      // whole-stage-codegen), so running it once per token occurrence
      // multiplies an expensive expression by corpus size — measured
      // 40× slower at sf0.1. Per distinct word it runs |vocab| times;
      // the checkpointed (word, nt) table then broadcast-joins the
      // codegen'd occurrence scan (exactly the oracle's shape: encode
      // the word table, join occurrences back).
      val vmap = typedLit(vocab)
      val wnt = wf.select(col("word").as("w"),
        size(piecesCol(col("word"), dpCol(col("word"), vmap))).cast("long").as("nt"))
        .localCheckpoint(true)
      val w = col("w")
      Tables.documents(s, dir)
        .select(col("lang"), explode(Exprs.tokens(col("text"))).as("w"))
        .filter(w.rlike("^[ -~]+$") && length(w) <= MaxWordLen)
        .join(broadcast(wnt), "w")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"), sum("nt").as("n_tokens"),
          round(sum("nt") * lit(1.0) / count(lit(1)), 6).as("fertility"))
    }
  )
}
