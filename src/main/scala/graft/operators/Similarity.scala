package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`array<float>`, 64-dim).
  *
  * Two paths, as a real ANN stack has:
  *   - brute-force cosine top-k: the exact baseline. One broadcast of the
  *     query vector + one `TakeOrderedAndProject` — no shuffle of the
  *     corpus, scales linearly with corpus size;
  *   - sign-LSH bucketed ANN: hyperplane-sign buckets computed in a single
  *     projection pass; the query probes only its own bucket (1/2^planes of
  *     the corpus in expectation) — the 100 TB path, trading recall for a
  *     ~2^planes scan reduction. An IVF variant would swap the hash for a
  *     learned centroid assignment; the operator shape is identical.
  *
  * All vector math is codegen-friendly HOFs ([[VectorOps]]), exact ints or
  * order-stable doubles, reproducible by the DuckDB oracle.
  */
object Similarity {

  /** Shared oracle fragment: cosine(a.embedding, b.embedding) as DuckDB SQL
    * mirroring VectorOps.cosine (float→double widening, in-order fold). */
  private def cosSql(a: String, b: String) =
    s"""round(list_sum(list_transform(range(1, len($a.embedding)+1), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE))
       |    / (sqrt(list_sum(list_transform(range(1, len($a.embedding)+1), i -> $a.embedding[i]::DOUBLE * $a.embedding[i]::DOUBLE)))
       |     * sqrt(list_sum(list_transform(range(1, len($b.embedding)+1), i -> $b.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE)))), 6)""".stripMargin

  private def bucketSql(planes: Int) =
    s"""CAST(list_sum(list_transform(range(0, $planes), p ->
       |      CASE WHEN list_sum(list_transform(range(1, len(embedding)+1), dd ->
       |             embedding[dd]::DOUBLE * (CASE WHEN substr(md5(p || ':' || (dd-1)), 1, 1) >= '8' THEN 1.0 ELSE -1.0 END))) > 0
       |           THEN 1<<p ELSE 0 END)) AS BIGINT)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Exact top-10 nearest neighbors of vec_id=0 by cosine. Deterministic
    // order: rank on the ROUNDED cosine with vec_id tiebreak.
    QueryDef.sql("s01_knn_bruteforce",
      s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, ${cosSql("e", "q")} AS cos
         |FROM embeddings e, q WHERE e.vec_id <> 0
         |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin) {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
        emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), VectorOps.cosineR(col("embedding"), col("qe")).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
    },

    // LSH bucket histogram — verifies the signature computation end-to-end
    // (any per-plane sign flip changes the histogram).
    QueryDef.sql("s02_ann_buckets",
      s"""SELECT ${bucketSql(8)} AS bucket, count(*) AS n
         |FROM embeddings GROUP BY 1""".stripMargin) {
      (s, dir) =>
        Tables.embeddings(s, dir)
          .select(VectorOps.hyperplaneBucket(col("embedding"), planes = 8).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
    },

    // ANN probe: rank only the query's own bucket (4 planes → 16 buckets,
    // ~1/16 of the corpus scanned). The bucketed analogue of s01.
    QueryDef.sql("s03_ann_query",
      s"""WITH sig AS (
         |  SELECT vec_id, embedding, ${bucketSql(4)} AS bucket
         |  FROM embeddings),
         |q AS (SELECT bucket, embedding FROM sig WHERE vec_id = 0)
         |SELECT e.vec_id, ${cosSql("e", "q")} AS cos
         |FROM sig e JOIN q ON e.bucket = q.bucket
         |WHERE e.vec_id <> 0
         |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin) {
      (s, dir) =>
        val sig = Tables.embeddings(s, dir).select(
          col("vec_id"), col("embedding"),
          VectorOps.hyperplaneBucket(col("embedding"), planes = 4).as("bucket"))
        val q = sig.filter(col("vec_id") === 0)
          .select(col("bucket"), col("embedding").as("qe"))
        sig.join(broadcast(q), Seq("bucket"))
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"), VectorOps.cosineR(col("embedding"), col("qe")).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
    },

    // Per-label centroids, one row per (label, dim): the building block of
    // IVF partitioning / cluster-based retrieval. posexplode + one hash agg.
    QueryDef.sql("s04_label_centroids",
      """SELECT label, dim, avg(v) AS mean_v FROM (
        |  SELECT label, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
        |         unnest(embedding)::DOUBLE AS v
        |  FROM embeddings) GROUP BY label, dim""".stripMargin) {
      (s, dir) =>
        Tables.embeddings(s, dir)
          .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
          .groupBy("label", "dim")
          .agg(avg(col("v").cast("double")).as("mean_v"))
    }
  )
}
