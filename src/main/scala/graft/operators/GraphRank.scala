package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over the similarity graph — the graph-centrality companion
  * to [[Dedup.connectedComponents]]: where components tell you WHICH
  * docs form a near-dup cluster, rank tells you which member is the
  * cluster's hub (the one most similar to most others — a better
  * "canonical representative" signal than d08's length heuristic when
  * clusters are large and chain-shaped).
  *
  * Same iterative discipline as components/k-means (the three share the
  * engine's iterative-algorithm contract):
  *   - loop-invariant inputs (symmetrized edges, out-degrees) are
  *     localCheckpoint'd ONCE — at cluster scale, `checkpoint()` to
  *     reliable storage instead;
  *   - each iteration is ONE join + ONE aggregation — one shuffle
  *     round — with lineage truncated per round so plan analysis stays
  *     O(1) in the iteration count;
  *   - FIXED iteration count, not convergence detection: rank deltas
  *     decay geometrically (damping^k), so a fixed k bounds the error
  *     a priori and keeps the output deterministic for the spec.
  *
  * No dangling-node mass redistribution is needed: edges arrive
  * symmetrized, so every node has out-degree ≥ 1 by construction.
  */
object GraphRank {

  /** Ranks over an UNDIRECTED edge list (id_a, id_b), damping 0.85.
    * Returns (id, rank) with sum(rank) == number of nodes (the
    * random-surfer convention scaled by N, so scores are comparable
    * across corpus sizes). */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"pageRank needs >= 1 iteration, got $iters")
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint(true)
    var ranks = deg.select(col("src").as("id"), lit(1.0).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = sym
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
      // every node keeps a zero-contribution row so nodes that received
      // nothing this round still get the (1-d) teleport mass.
      // The per-round round(…, 12) is the same re-synchronization
      // contract k-means applies to its means: double summation order
      // differs across engines and partitionings, and over 10 chained
      // rounds ulp drift would compound into the 6th output decimal —
      // quantizing each iteration boundary (far above the 1e-6 output
      // grain, far below any rank gap) pins both engines and every
      // shuffle fan-out to identical round inputs.
      ranks = ranks.select(col("id"), lit(0.0).as("c"))
        .unionByName(contribs)
        .groupBy("id")
        .agg(round(lit(1.0 - damping) + lit(damping) * sum("c"), 12).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** The s13 oracle unrolls the 10 fixed iterations as a chained CTE
    * r1..r10 (DuckDB's recursive CTEs forbid grouped aggregation over
    * the recursive reference, but a FIXED iteration count needs no
    * recursion). Every node receives contributions each round — edges
    * are symmetrized, so indegree == outdegree >= 1 — which is why the
    * per-round join+GROUP BY reproduces [[pageRank]]'s union-with-zeros
    * form without an outer join. The teleport constant is interpolated
    * from the SAME double Spark computes (1.0 - damping in binary
    * floating point, not the decimal literal 0.15) so both engines run
    * identical arithmetic, and each round quantizes to 12 decimals in
    * lockstep with [[pageRank]] so summation-order drift can never
    * compound across rounds into the 6-decimal output. */
  private def pageRankSql(iters: Int, damping: Double): String = {
    val tp = java.lang.Double.toString(1.0 - damping)
    val dp = java.lang.Double.toString(damping)
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT e.dst AS id,
         |         round($tp::DOUBLE + $dp::DOUBLE * sum(r.rank / d.deg), 12) AS rank
         |  FROM sym e JOIN r${k - 1} r ON r.id = e.src JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${Dedup.embPairsCtes},
       |sym AS (SELECT id_a AS src, id_b AS dst FROM prs
       |        UNION SELECT id_b AS src, id_a AS dst FROM prs),
       |deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
       |r0 AS (SELECT src AS id, 1.0::DOUBLE AS rank FROM deg),
       |$rounds
       |SELECT id AS vec_id, round(rank, 6) AS rank FROM r$iters""".stripMargin
  }

  /** Directed bounded-degree walk graph: each node keeps its top
    * [[WalkDeg]] neighbors by (cos DESC, dst ASC) from the symmetrized
    * d05 pair list. Bounding out-degree is what makes RECURSIVE
    * traversal safe — path fan-out from one seed is ≤ deg^hops instead
    * of component-factorial — and the rank window is partitioned by
    * src (map-side WindowGroupLimit), never a global sort. Ties are
    * deterministic because `cos` is the 6-decimal-rounded value both
    * engines compute identically (the d05 contract). */
  private[operators] def walkEdges(edges: DataFrame, deg: Int = WalkDeg): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"), col("cos"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst"), col("cos")))
    import org.apache.spark.sql.expressions.Window
    sym.withColumn("rn",
        row_number().over(Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))))
      .filter(col("rn") <= deg)
      .select("src", "dst")
  }

  private[operators] val WalkDeg = 2
  private[operators] val WalkHops = 7
  private[operators] val WalkSeeds = 5

  /** Iterative BFS over (src, dst) from the top-[[WalkSeeds]] in-degree
    * hubs — the cluster-scale twin of the q76 recursive CTE. All seeds
    * walk SIMULTANEOUSLY through one (seed, vec_id) state table (the
    * s23 batched-walk shape: round cost amortizes over the seed batch);
    * frontier and visited are localCheckpoint'd per round (truncated
    * lineage, the s06/s13/t24 loop contract), each round is one join +
    * one anti-join, and the loop stops on the A6 emptiness guard or
    * the hop cap, whichever first. Returns (seed, vec_id, min hops). */
  def bfs(edges: DataFrame, maxHops: Int = WalkHops): DataFrame = {
    val e = edges.select("src", "dst").localCheckpoint(true)
    var visited = e.groupBy("dst").agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("dst")).limit(WalkSeeds)
      .select(col("dst").as("seed"), col("dst").as("vec_id"), lit(0L).as("hops"))
      .localCheckpoint(true)
    var frontier = visited
    var hop = 0L
    while (hop < maxHops && frontier.take(1).nonEmpty) {
      hop += 1
      frontier = e.join(frontier.select(col("seed"), col("vec_id").as("src")), "src")
        .select(col("seed"), col("dst").as("vec_id")).distinct()
        .join(visited.select("seed", "vec_id"), Seq("seed", "vec_id"), "left_anti")
        .select(col("seed"), col("vec_id"), lit(hop).as("hops"))
        .localCheckpoint(true)
      visited = visited.unionByName(frontier).localCheckpoint(true)
    }
    visited
  }

  /** The recursive walk both engines run verbatim: anchored at the
    * top-[[WalkSeeds]] in-degree hubs (deterministic: ties break on
    * node id), one step per round along the top-deg edges, hop-capped;
    * min-hop aggregation happens OUTSIDE the recursion (neither engine
    * allows aggregating the recursive reference). UNION ALL enumerates
    * paths, which the degree bound caps at deg^hops per seed. */
  private def walkSql(edgeRel: String): String =
    s"""walk(seed, id, hops) AS (
       |  SELECT dst, dst, 0 FROM (
       |    SELECT dst FROM $edgeRel GROUP BY dst
       |    ORDER BY count(*) DESC, dst LIMIT $WalkSeeds)
       |  UNION ALL
       |  SELECT w.seed, e.dst, w.hops + 1
       |  FROM walk w JOIN $edgeRel e ON e.src = w.id
       |  WHERE w.hops < $WalkHops)""".stripMargin

  private def reachabilitySql: String =
    s"""WITH RECURSIVE ${Dedup.embPairsCtes},
       |sym AS (SELECT id_a AS src, id_b AS dst, cos FROM prs
       |        UNION ALL SELECT id_b AS src, id_a AS dst, cos FROM prs),
       |walk_edges AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |           row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
       |    FROM sym) WHERE rn <= $WalkDeg),
       |${walkSql("walk_edges")}
       |SELECT seed, id AS vec_id, CAST(min(hops) AS BIGINT) AS hops
       |FROM walk GROUP BY seed, id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // Hub scores over the d05 embedding near-dup graph, oracle-checked
    // end-to-end: the DuckDB side re-derives the same edge list (d05's
    // shared prs CTE) and runs the identical 10 damped iterations,
    // unrolled. The algorithm is additionally value-asserted against
    // closed-form ranks on known graphs in GraphRankSpec.
    QueryDef.sql("s13_pagerank", pageRankSql(iters = 10, damping = 0.85)) {
      (s, dir) =>
        val edges = Dedup.embeddingPairs(Tables.embeddings(s, dir))
        pageRank(edges, iters = 10)
          .select(col("id").as("vec_id"), round(col("rank"), 6).as("rank"))
    },

    // Recursive-CTE reachability (q76): min-hop BFS from the walk
    // graph's top in-degree hubs, run through Spark's NATIVE
    // `WITH RECURSIVE` support (4.x) on the SQL path — the transitive
    // "reachable through chains of near-duplicates" question d07
    // answers corpus-wide, spelled as the standard SQL recursion a
    // reference user would write, per-seed (the per-cluster-closure
    // shape). DuckDB runs the byte-identical walk. The hop cap and the
    // top-2 degree bound make UNION ALL path enumeration finite and
    // tiny (≤ 2^8 rows per seed); [[bfs]] is the checkpointed
    // frontier-iteration twin for unbounded-depth traversals at
    // cluster scale, equivalence-tested in GraphRankSpec.
    QueryDef.sql("q76_reachability", reachabilitySql) {
      (s, dir) =>
        // Materialize the edge list once: the recursion re-reads its
        // anchor relation every round, and an unmaterialized view here
        // would re-derive the whole LSH pair pass per hop (measured 4 s
        // → ~1.5 s at sf0.1). Same contract as the bfs twin's first line.
        walkEdges(Dedup.embeddingPairs(Tables.embeddings(s, dir)))
          .localCheckpoint(true)
          .createOrReplaceTempView("walk_edges_v")
        s.sql(
          s"""WITH RECURSIVE ${walkSql("walk_edges_v")}
             |SELECT seed, id AS vec_id, CAST(min(hops) AS BIGINT) AS hops
             |FROM walk GROUP BY seed, id""".stripMargin)
    }
  )
}
