package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("pageRank: hub outranks leaves, mass is conserved on undirected graphs") {
    // star: 1 is the hub of 2,3,4 (undirected)
    val ranks = Graph.pageRank(undirected((1L, 2L), (1L, 3L), (1L, 4L)))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank"))
      .toMap
    assert(ranks.size == 4)
    assert(ranks(1L) > ranks(2L))
    assert(ranks(2L) == ranks(3L) && ranks(3L) == ranks(4L),
      "symmetric leaves must tie exactly")
    // no dangling nodes (every node has out-edges) -> total rank stays 1
    assert(math.abs(ranks.values.sum - 1.0) < 1e-5)
  }

  test("pageRank on a symmetric cycle is exactly uniform") {
    val ranks = Graph.pageRank(undirected((1L, 2L), (2L, 3L), (3L, 1L)))
      .collect().map(_.getAs[Double]("rank")).toSet
    assert(ranks.size == 1, s"cycle nodes must all tie, got $ranks")
  }

  test("components labels islands by min node id with exact sizes") {
    val comps = Graph.components(
      undirected((1L, 2L), (2L, 3L), (10L, 11L)))
      .collect().map(r => r.getAs[Long]("label") -> r.getAs[Long]("n_nodes"))
      .toMap
    assert(comps == Map(1L -> 3L, 10L -> 2L))
  }

  test("degreeHistogram counts nodes per degree, dedup included") {
    val edges = undirected((1L, 2L), (1L, 3L))
      .unionByName(Seq((1L, 2L)).toDF("src", "dst")) // duplicate edge
    val h = Graph.degreeHistogram(edges).collect()
      .map(r => r.getAs[Long]("degree") -> r.getAs[Long]("n_nodes")).toMap
    // node 1 has degree 2; nodes 2 and 3 degree 1 (dup edge not recounted)
    assert(h == Map(2L -> 1L, 1L -> 2L))
  }
}
