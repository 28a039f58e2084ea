package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** t37: fit the 16-bucket hashed linear quality classifier IN-ENGINE —
  * the training half t22's inference always implied. (The reference has
  * no model training at all; this is the fasttext-shaped step a corpus
  * prep stack actually runs first: label a slice, fit a cheap linear
  * probe over hashed token features, gate the corpus with it.)
  *
  * Shape of the fit (the s06/t24 iterative-loop contract):
  *   - features are per-doc HASH-BUCKET counts (md5 last nibble — the
  *     same engine-portable convention as t22/LSH): ONE corpus pass,
  *     checkpointed wide (n, c0..c15), every round scans the checkpoint;
  *   - `Rounds` squared-loss gradient steps; each round is ONE global
  *     aggregate (16 scaled-integer sums — the per-doc gradient terms
  *     are 6dp-quantized then summed as exact BIGINTs, so the sum is
  *     partition-order invariant by arithmetic) and one 16-double
  *     driver round-trip (scalar traffic only, the k×dim contract);
  *   - round boundaries quantize the weights to 6dp (BigDecimal
  *     HALF_UP ↔ DuckDB round — the established re-sync contract), so
  *     both engines enter every round bit-identical.
  *
  * The supervision stand-in is balanced and exactly linear in the
  * features — 3·(c4+c5) > n, the two buckets carrying the corpus's
  * heaviest tokens — so a few gradient rounds measurably beat the
  * majority class (~92% vs ~51%, pinned in QualityTrainSpec) and the
  * fit is a real convergence story, not noise fitting.
  *
  * 100 TB posture: the weight vector is 16 doubles (a production 2^20
  * bucket table rides the same loop as a broadcast array); the corpus
  * is scanned once per round with no joins; nothing corpus-sized ever
  * reaches the driver.
  */
object QualityTrain {

  val Buckets = 16
  val Rounds = 4
  val Lr = 12.0

  /** Per-doc labeled features: (doc_id, n, c0..c15, y), one row per
    * non-empty doc, checkpointed — every training round and the final
    * inference scan this materialization instead of re-tokenizing. */
  def features(docs: DataFrame): DataFrame = {
    val bucket =
      (instr(lit("0123456789abcdef"), substring(md5(col("tok")), 32, 1)) - 1).cast("int")
    val sums = (0 until Buckets).map(b =>
      sum(when(col("b") === b, 1L).otherwise(0L)).as(s"c$b"))
    docs
      .select(col("doc_id"), explode(graft.functions.Exprs.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), bucket.as("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sums: _*)
      .withColumn("y",
        when(lit(3) * (col("c4") + col("c5")) > col("n"), 1.0).otherwise(0.0))
      .localCheckpoint(true)
  }

  /** The 6dp-quantized margin w·c/n under the CURRENT weights — shared
    * by the gradient rounds and the accuracy eval. Addition is
    * left-to-right b=0..15, mirrored exactly in the oracle SQL. */
  private def marginCol(w: Array[Double]) =
    round((0 until Buckets).map(b => lit(w(b)) * col(s"c$b")).reduce(_ + _) / col("n"), 6)

  /** `Rounds` gradient steps from w⁰ = 0. Returns the 6dp-quantized
    * weight vector. One aggregate job + one 16-double collect per
    * round. */
  def fit(feat: DataFrame, rounds: Int = Rounds): Array[Double] = {
    val m = feat.count()
    var w = Array.fill(Buckets)(0.0)
    for (_ <- 0 until rounds) {
      val err = marginCol(w) - col("y")
      val gsums = (0 until Buckets).map(b =>
        sum(round(round(err * col(s"c$b") / col("n"), 6) * 1e6).cast("long")).as(s"g$b"))
      val row = feat.agg(gsums.head, gsums.tail: _*).head()
      w = Array.tabulate(Buckets) { b =>
        BigDecimal(w(b) - Lr * (row.getLong(b) / 1e6) / m)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    w
  }

  /** Trained-classifier gate over the feature frame: integer-exact
    * decision 2·Σ round(wᵦ·10⁶)·cᵦ > 10⁶·n ⇔ mean bucket weight > ½ —
    * the same scaled-integer discipline as the old literal-table t22,
    * now over FITTED weights. */
  def classify(feat: DataFrame, w: Array[Double]): DataFrame = {
    val ws = w.map(x => math.round(x * 1e6)) // 6dp weights are integral at 1e6 scale
    val fs = (0 until Buckets).map(b => lit(ws(b)) * col(s"c$b")).reduce(_ + _)
    // mean_w stays UNROUNDED: fs and n are exact integers, so the two
    // divisions are IEEE-deterministic in both engines — a round(…, 6)
    // here would re-introduce the half-boundary hazard the scaled-int
    // pipeline exists to avoid (observed: 0.3500905 splitting engines).
    feat.select(col("doc_id"), col("n").as("n_tokens"), fs.as("feat_scaled"))
      .select(col("doc_id"), col("n_tokens"), col("feat_scaled"),
        (col("feat_scaled") / lit(1000000.0) / col("n_tokens")).as("mean_w"),
        when(lit(2) * col("feat_scaled") > lit(1000000L) * col("n_tokens"), 1L)
          .otherwise(0L).as("keep"))
  }

  // ---------------------------------------------------------------- oracle

  /** Oracle chain (expects `toks` in scope): feat/lab materialized once,
    * then the `Rounds` gradient rounds unrolled as w1..wR — a LINEAR CTE
    * chain (each round referenced only by the next, the s06/t24
    * treatment; only the corpus-sized lab is MATERIALIZED). Ends in
    * `w$Rounds` (one row, w0..w15) and `lab`. */
  private[operators] def ctes(rounds: Int = Rounds): String = {
    val cs = (0 until Buckets)
    val featSums = cs.map(b =>
      s"CAST(sum(CASE WHEN b = $b THEN 1 ELSE 0 END) AS BIGINT) AS c$b").mkString(",\n         ")
    val w0 = cs.map(b => s"CAST(0.0 AS DOUBLE) AS w$b").mkString(", ")
    val marginSql = cs.map(b => s"w.w$b * l.c$b").mkString(" + ")
    val roundsSql = (1 to rounds).map { r =>
      val gs = cs.map(b =>
        s"""sum(CAST(round(round((round(($marginSql) / l.n, 6) - l.y) * l.c$b / l.n, 6) * 1000000.0) AS BIGINT)) AS g$b""")
        .mkString(",\n         ")
      val ws = cs.map(b =>
        s"round(w.w$b - $Lr * (g.g$b / 1000000.0) / c.m, 6) AS w$b").mkString(",\n         ")
      s"""g$r AS (
         |  SELECT $gs
         |  FROM lab l, w${r - 1} w),
         |w$r AS (
         |  SELECT $ws
         |  FROM w${r - 1} w, g$r g, cnt c)""".stripMargin
    }.mkString(",\n")
    s"""ex AS (SELECT doc_id, unnest(t) AS tok FROM toks),
       |bx AS (SELECT doc_id, strpos('0123456789abcdef', substr(md5(tok), 32, 1)) - 1 AS b FROM ex),
       |feat AS MATERIALIZED (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
       |         $featSums
       |  FROM bx GROUP BY doc_id),
       |lab AS MATERIALIZED (
       |  SELECT *, CASE WHEN 3 * (c4 + c5) > n THEN 1.0 ELSE 0.0 END AS y FROM feat),
       |cnt AS (SELECT CAST(count(*) AS BIGINT) AS m FROM lab),
       |w0 AS (SELECT $w0),
       |$roundsSql""".stripMargin
  }
}
