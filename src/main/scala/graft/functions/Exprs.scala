package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure `Column` expression library — everything stays inside whole-stage
  * codegen (no Scala UDFs anywhere; SURVEY §2.7).
  */
object Exprs {

  /** ISO-8601 `PT#H#M` duration → total minutes.
    *
    * Semantics match the reference UDF `duration_to_minutes`
    * (`/root/reference/mnt/airflow/dags/scripts/transformToSilver.py:19-28`):
    * no-match → null, missing H or M group → 0 for that group.
    * Expressed as composed built-ins so the whole plan codegens.
    */
  def durationToMinutes(c: Column): Column = {
    val matched = c.rlike("^PT(\\d+H)?(\\d+M)?$")
    val h = coalesce(nullif(regexp_extract(c, "^PT(\\d+)H", 1), lit("")).cast("int"), lit(0))
    val m = coalesce(nullif(regexp_extract(c, "(\\d+)M$", 1), lit("")).cast("int"), lit(0))
    when(c.isNull || !matched, lit(null).cast("int")).otherwise(h * 60 + m)
  }

  /** `"a||b||c"` packed list → array; null → empty array (reference
    * `transformToSilver.py:56-60`). */
  def splitPacked(c: Column, delim: String = "\\|\\|"): Column =
    when(c.isNull, array().cast("array<string>")).otherwise(split(c, delim))

  /** Scrub dirty int-array elements: `'None'/'null'/null/''` → 0
    * (reference `transformToSilver.py:83-90`). */
  def scrubIntArray(arr: Column): Column =
    transform(arr, x =>
      when(x.isNull || trim(x).isin("None", "null", ""), lit(0))
        .otherwise(trim(x).cast("int")))

  /** Per-element ISO string → timestamp (reference intent at
    * `transformToSilver.py:78-80`; the UDF-by-name there cannot run). */
  def isoArrayToTs(arr: Column): Column =
    transform(arr, x => x.cast("timestamp"))

  // ---------------------------------------------------------------------
  // Hashing / text primitives shared by the dedup + text-analysis operators.
  // All are hex-string based (md5) so a SQL oracle can reproduce them
  // bit-for-bit; fixed-width lowercase hex compares lexicographically in
  // numeric order, so `min` over hex == numeric minhash.
  // ---------------------------------------------------------------------

  /** Stable 64-bit-equivalent hash as a 16-char hex string. */
  def hash16(c: Column): Column = substring(md5(c), 1, 16)

  /** Whitespace tokens of lower-cased text; empties dropped.
    *
    * After `trim`, `split` on `\s+` can produce an empty token ONLY for
    * the empty string (separator runs are consumed whole, so no interior
    * or leading/trailing empties survive) — so the empty-element cleanup
    * is a single codegen'd `when`, not a per-element `filter` lambda
    * (HOFs evaluate interpreted; this sits under every text query). */
  def tokens(text: Column): Column = {
    val t = lower(trim(text))
    when(t === "", array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  /** Distinct whitespace tokens. */
  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Consecutive word n-gram shingles (space-joined), distinct.
    * Documents shorter than n words yield the whole text as one shingle.
    *
    * Built as a zip_with chain over k-shifted copies of the token array,
    * NOT as `transform(sequence, i => element_at(toks, i+k))`: higher-order
    * functions evaluate interpreted, and any non-lambda-variable expression
    * inside the lambda body is re-evaluated per element — the element_at
    * form recomputes the whole tokenization per gram, O(L²) per document.
    * zip_with evaluates each input array once. Trailing partial grams from
    * zip_with's null-padding are dropped by the final slice (and for docs
    * shorter than n, that same padding yields the whole-text shingle). */
  def wordShingles(toks: Column, n: Int): Column =
    array_distinct(wordShinglesAll(toks, n))

  /** Positional (non-distinct) n-gram shingles: element i is the gram
    * starting at token i, so `posexplode` over this array gives every
    * span start — the form span-level duplicate accounting (d15) needs,
    * where repeated occurrences of a gram within one document each
    * count. Same zip_with construction and short/empty-document
    * semantics as [[wordShingles]]. */
  def wordShinglesAll(toks: Column, n: Int): Column = {
    val joined = (1 until n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), greatest(size(toks) - k, lit(0))),
        (a, b) => concat_ws(" ", a, b))
    }
    val grams = slice(joined, lit(1), greatest(size(toks) - (n - 1), lit(1)))
    // Zero tokens (empty/whitespace-only text) → the single empty shingle,
    // matching the SQL-oracle formulation (array_to_string over an empty
    // slice yields ''); null toks stay null on both sides.
    when(size(toks) === 0, array(lit(""))).otherwise(grams)
  }
}
