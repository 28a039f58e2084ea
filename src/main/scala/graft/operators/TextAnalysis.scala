package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Exprs
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — token statistics,
  * quality scoring, heuristic language ID, content fingerprinting and
  * winnowing signatures, n-gram document frequency.
  *
  * All are pure projections or single hash-aggregations (no joins, no
  * windows), so they scale linearly: at 100 TB each is one codegen'd scan
  * stage, plus one shuffle where a groupBy exists. Ratios are kept as
  * exact int/int divisions so the DuckDB oracle reproduces them bit-for-bit.
  *
  * The reference has no text analytics (its strings are airport codes,
  * `/root/reference/mnt/airflow/dags/scripts/transformToSilver.py:44-46`);
  * this module is the north-star extension surface.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the heuristic language ID.
    * Deliberately small and hard-coded: the oracle must embed the same
    * lists, and the point is the operator shape (argmax over per-class
    * token-hit counts), not lexicon quality. */
  private val stop = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit"),
    "es" -> Seq("el", "la", "los", "y", "que", "en", "un"),
    "fr" -> Seq("le", "les", "et", "est", "dans", "pour", "un"))

  private val toksCte =
    """toks AS (
      |  SELECT *, list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
      |  FROM documents)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Token counting: whitespace tokens, distinct tokens, type-token ratio.
    QueryDef.sql("t01_token_stats",
      s"""WITH $toksCte
         |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         |       CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
         |       len(list_distinct(t)) / len(t) AS ttr
         |FROM toks""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), Exprs.tokens(col("text")).as("t"))
          .select(col("doc_id"),
            size(col("t")).cast("long").as("n_tokens"),
            size(array_distinct(col("t"))).cast("long").as("n_distinct"),
            (size(array_distinct(col("t"))) / size(col("t"))).as("ttr"))
    },

    // Quality scoring: length, mean word length, stopword ratio, composite.
    // Every ratio is int/int so both engines produce identical doubles.
    QueryDef.sql("t02_quality_score",
      s"""WITH $toksCte
         |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m,
         |       list_sum(list_transform(t, x -> length(x))) / len(t) AS avg_word_len,
         |       len(list_filter(t, x -> x IN ('the','a','and','of','to','in','is'))) / len(t) AS stop_ratio,
         |       round(0.5 * (len(list_distinct(t)) / len(t))
         |           + 0.5 * (len(list_filter(t, x -> x IN ('the','a','and','of','to','in','is'))) / len(t)), 6) AS quality
         |FROM toks""".stripMargin) {
      (s, dir) =>
        val t = col("t")
        val en = stop("en")
        val stopRatio = size(filter(t, x => x.isin(en: _*))) / size(t)
        val ttr = size(array_distinct(t)) / size(t)
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"), Exprs.tokens(col("text")).as("t"))
          .select(col("doc_id"),
            length(col("text")).cast("long").as("n_chars_m"),
            (aggregate(transform(t, x => length(x)), lit(0), (acc, x) => acc + x) / size(t))
              .as("avg_word_len"),
            stopRatio.as("stop_ratio"),
            round(lit(0.5) * ttr + lit(0.5) * stopRatio, 6).as("quality"))
    },

    // Heuristic language ID: argmax of per-language stopword hit counts
    // with a fixed priority order on ties; confusion counts vs the fixture
    // label. Integer scores → deterministic across engines.
    QueryDef.sql("t03_lang_id", {
      def hits(l: String) =
        s"len(list_filter(t, x -> x IN (${stop(l).map("'" + _ + "'").mkString(",")})))"
      s"""WITH $toksCte,
         |scored AS (
         |  SELECT lang,
         |         ${hits("en")} AS s_en, ${hits("de")} AS s_de,
         |         ${hits("es")} AS s_es, ${hits("fr")} AS s_fr
         |  FROM toks)
         |SELECT lang,
         |       CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |            WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         |            WHEN s_es >= s_fr THEN 'es'
         |            ELSE 'fr' END AS predicted,
         |       count(*) AS n
         |FROM scored GROUP BY 1, 2""".stripMargin
    }) {
      (s, dir) =>
        def hits(l: String) = size(filter(col("t"), x => x.isin(stop(l): _*)))
        Tables.documents(s, dir)
          .select(col("lang"), Exprs.tokens(col("text")).as("t"))
          .select(col("lang"),
            hits("en").as("s_en"), hits("de").as("s_de"),
            hits("es").as("s_es"), hits("fr").as("s_fr"))
          .select(col("lang"),
            when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
              .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
              .when(col("s_es") >= col("s_fr"), "es")
              .otherwise("fr").as("predicted"))
          .groupBy("lang", "predicted")
          .agg(count(lit(1)).as("n"))
    },

    // Content fingerprint: hash of the whitespace/case-normalized token
    // stream — catches duplicates that differ only in spacing/casing.
    QueryDef.sql("t04_fingerprint",
      s"""WITH $toksCte
         |SELECT doc_id, substr(md5(array_to_string(t, ' ')), 1, 16) AS fp
         |FROM toks""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            Exprs.hash16(concat_ws(" ", Exprs.tokens(col("text")))).as("fp"))
    },

    // Winnowing-style signature: concat of the 4 smallest bigram-shingle
    // hashes — a compact sketch whose equality implies heavy overlap.
    QueryDef.sql("t05_winnow_sig",
      s"""WITH $toksCte,
         |sh AS (
         |  SELECT doc_id,
         |         list_distinct(list_transform(range(1, greatest(len(t)-1, 1)+1),
         |           i -> array_to_string(t[i:i+1], ' '))) AS sh
         |  FROM toks)
         |SELECT doc_id,
         |       array_to_string(list_sort(list_transform(sh, s -> substr(md5(s), 1, 16)))[1:4], '') AS sig
         |FROM sh""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), Exprs.wordShingles(Exprs.tokens(col("text")), 2).as("sh"))
          .select(col("doc_id"),
            concat_ws("", slice(array_sort(transform(col("sh"), x =>
              Exprs.hash16(x))), 1, 4)).as("sig"))
    },

    // N-gram document frequency: top-20 bigrams by number of documents
    // containing them (shingles are distinct per doc, so count == DF).
    QueryDef.sql("t06_top_bigrams",
      s"""WITH $toksCte,
         |sh AS (
         |  SELECT doc_id,
         |         list_distinct(list_transform(range(1, greatest(len(t)-1, 1)+1),
         |           i -> array_to_string(t[i:i+1], ' '))) AS sh
         |  FROM toks)
         |SELECT gram, count(*) AS df FROM (SELECT doc_id, unnest(sh) AS gram FROM sh)
         |GROUP BY gram ORDER BY df DESC, gram LIMIT 20""".stripMargin) {
      (s, dir) => {
        // Bigrams via posexplode + window lead instead of a per-row HOF:
        // everything after the explode is codegen'd, and the one shuffle
        // (on high-cardinality doc_id) also serves the per-doc distinct.
        // A lone pos=0 row with no successor is a 1-token doc, whose
        // "shingle" is the whole text (wordShingles' short-doc rule).
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("doc_id").orderBy("pos")
        Tables.documents(s, dir)
          .select(col("doc_id"), posexplode(Exprs.tokens(col("text"))).as(Seq("pos", "tok")))
          .withColumn("nxt", lead("tok", 1).over(w))
          .filter(col("nxt").isNotNull || col("pos") === 0)
          .select(col("doc_id"), concat_ws(" ", col("tok"), col("nxt")).as("gram"))
          .distinct()
          .groupBy("gram").agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("gram"))
          .limit(20)
      }
    },

    // Deterministic train/val/test assignment by content-stable hash —
    // the production-correct form of dataset splitting: reproducible
    // across runs/retries/partitionings (an RNG sample is none of those),
    // and any engine can re-derive membership. ~75/12.5/12.5 via the
    // first hex digit of a salted md5.
    QueryDef.sql("t08_hash_split",
      """SELECT lang,
        |       CASE WHEN substr(md5('split:' || doc_id), 1, 1) <= 'b' THEN 'train'
        |            WHEN substr(md5('split:' || doc_id), 1, 1) <= 'd' THEN 'val'
        |            ELSE 'test' END AS split,
        |       count(*) AS n
        |FROM documents GROUP BY 1, 2""".stripMargin) {
      (s, dir) => {
        val h1 = substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 1)
        Tables.documents(s, dir)
          .withColumn("split",
            when(h1 <= "b", "train").when(h1 <= "d", "val").otherwise("test"))
          .groupBy("lang", "split").agg(count(lit(1)).as("n"))
      }
    },

    // BPE-ish subword counting: a tokenizer-shaped regex (letter runs,
    // digit runs, single non-space symbols) — the standard pre-tokenizer
    // split a byte-pair encoder sees, as a codegen'd regexp count.
    QueryDef.sql("t07_bpe_tokens",
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe,
        |       CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT) AS n_vowel_runs
        |FROM documents""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir).select(
          col("doc_id"),
          size(regexp_extract_all(col("text"),
            lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("n_bpe"),
          size(regexp_extract_all(lower(col("text")),
            lit("[aeiou]+"), lit(0))).cast("long").as("n_vowel_runs"))
    }
  )
}
