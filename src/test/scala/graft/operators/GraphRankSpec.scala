package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  /** Reference power iteration over adjacency lists — the executable
    * spec the distributed form must reproduce. */
  private def refRanks(edges: Seq[(Long, Long)], iters: Int, d: Double = 0.85): Map[Long, Double] = {
    val sym = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val adj = sym.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var r = adj.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val contribs = adj.toSeq.flatMap { case (s, ds) => ds.map(_ -> r(s) / ds.size) }
        .groupBy(_._1).map { case (n, cs) => n -> cs.map(_._2).sum }
      r = r.keys.map(n => n -> ((1 - d) + d * contribs.getOrElse(n, 0.0))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    GraphRank.pageRank(edges.toDF("id_a", "id_b"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("star graph: hub outranks leaves; matches reference power iteration") {
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val got = run(edges, 10)
    val want = refRanks(edges, 10)
    assert(got.keySet === want.keySet)
    got.foreach { case (n, r) => assert(math.abs(r - want(n)) < 1e-9, s"node $n: $r vs ${want(n)}") }
    assert(got(0L) > got(1L) * 2, s"hub should dominate: $got")
    assert(math.abs(got.values.sum - 4.0) < 1e-6, "rank mass conserved (sum == N)")
  }

  test("regular graph: every node ranks exactly 1.0 at any iteration count") {
    val got = run(Seq((1L, 2L), (3L, 4L)), 7)
    got.values.foreach(r => assert(math.abs(r - 1.0) < 1e-12, s"got $got"))
  }

  test("path graph: interior nodes outrank endpoints; matches reference") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val got = run(edges, 15)
    val want = refRanks(edges, 15)
    got.foreach { case (n, r) => assert(math.abs(r - want(n)) < 1e-9, s"node $n") }
    assert(got(2L) > got(1L) && got(3L) > got(4L), s"got $got")
  }

  test("s13 over the sf0.001 near-dup graph: one rank per node, hubs exist") {
    val df = graft.SparkEntry.queries("s13_pagerank")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    val nodes = Dedup.embeddingPairs(graft.Tables.embeddings(spark, "/root/testdata/sf0.001"))
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct().count()
    assert(rows.length.toLong === nodes, "one rank row per graph node")
    assert(rows.map(_.getDouble(1)).sum > 0.0)
  }

  test("bfs on a known graph: exact min-hop levels from the top-indegree hubs") {
    // Chain 10-11-12-13 plus a reverse edge 11->10 making 10 the in-degree
    // tie-break winner among equals; directed edges as given (no symmetrize
    // here — bfs consumes walkEdges output, already direction-resolved).
    val e = Seq((10L, 11L), (11L, 10L), (11L, 12L), (12L, 13L)).toDF("src", "dst")
    val got = GraphRank.bfs(e, maxHops = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // top-5 in-degree seeds over 4 distinct dst values = all of 10,11,12,13
    assert(got((10L, 10L)) === 0L && got((10L, 11L)) === 1L
      && got((10L, 12L)) === 2L && got((10L, 13L)) === 3L)
    assert(got((13L, 13L)) === 0L && !got.contains((13L, 10L)),
      "13 has no out-edges: its walk stays at the seed")
  }

  test("bfs respects the hop cap") {
    val e = (0L until 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = GraphRank.bfs(e, maxHops = 2).collect().map(_.getLong(2))
    assert(got.max === 2L, "no node beyond the cap")
  }

  test("q76 native recursive CTE == checkpointed frontier bfs on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val rcte = graft.SparkEntry.queries("q76_reachability")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val iter = GraphRank.bfs(
        GraphRank.walkEdges(Dedup.embeddingPairs(graft.Tables.embeddings(spark, dir))))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rcte === iter, "the two traversal engines must agree exactly")
    assert(rcte.nonEmpty && rcte.count { case ((s, v), h) => h === 0L && s === v } > 0)
  }
}
