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
      // nothing this round still get the (1-d) teleport mass
      ranks = ranks.select(col("id"), lit(0.0).as("c"))
        .unionByName(contribs)
        .groupBy("id")
        .agg((lit(1.0 - damping) + lit(damping) * sum("c")).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }

  val defs: Seq[QueryDef] = Seq(
    // Hub scores over the d05 embedding near-dup graph. Rows-only: the
    // oracle can't iterate (recursive-CTE aggregation restrictions) —
    // the algorithm is value-asserted against closed-form ranks on
    // known graphs in GraphRankSpec, and the row count (= node count)
    // is pinned by d05's oracled pair query.
    QueryDef.noOracle("s13_pagerank") { (s, dir) =>
      val edges = Dedup.embeddingPairs(Tables.embeddings(s, dir))
      pageRank(edges, iters = 10)
        .select(col("id").as("vec_id"), round(col("rank"), 6).as("rank"))
    }
  )
}
