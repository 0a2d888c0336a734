package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand twins for the second round-10 wave (SCC, copula, embedding
  * decontamination). */
class Wave10bSpec extends SparkSpec {

  import spark.implicits._

  test("stronglyConnectedComponents: planted digraph resolves cycles, " +
      "bridges and singletons — and needs the multi-pass peel") {
    // SCC {1,2,3}; SCC {10,11} reachable FROM it (so its backward-min
    // is 1 on pass 1 — only classified after the first peel); 7 and 20
    // are singletons pointing INTO cycle A
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 10L), (3L, 10L),
      (7L, 2L), (20L, 1L)).toDF("src", "dst")
    val out = Graph.stronglyConnectedComponents(edges).collect()
      .map(r => r.getAs[Long]("scc_id") -> r.getAs[Long]("n_nodes")).toMap
    assert(out == Map(1L -> 3L, 10L -> 2L, 7L -> 1L, 20L -> 1L), s"$out")
  }

  test("stronglyConnectedComponents: a pure DAG is all singletons; a " +
      "full cycle is one component") {
    val dag = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val d = Graph.stronglyConnectedComponents(dag).collect()
      .map(r => r.getAs[Long]("scc_id") -> r.getAs[Long]("n_nodes")).toMap
    assert(d == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"$d")
    val ring = (1L to 6L).map(i => (i, i % 6 + 1)).toDF("src", "dst")
    val r = Graph.stronglyConnectedComponents(ring).collect()
    assert(r.length == 1 && r.head.getAs[Long]("scc_id") == 1L &&
      r.head.getAs[Long]("n_nodes") == 6L)
  }

  test("empiricalCopula: comonotone days load the diagonal (lift k), " +
      "antimonotone the antidiagonal") {
    def ev(flip: Boolean) = (0 until 32).flatMap { d =>
      val x = 10.0 + d
      val y = if (flip) 10.0 + (31 - d) else 10.0 + d
      Seq((d * 86400L, "click", x), (d * 86400L, "view", y))
    }.zipWithIndex.map { case ((s, t, v), i) => (i.toLong, s, t, v) }
      .toDF("event_id", "s", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("s")).as("ts"),
        lit(1L).as("user_id"), col("event_type"), col("value"))
    val co = Stats.empiricalCopula(ev(flip = false)).collect()
      .map(r => (r.getAs[Long]("qx"), r.getAs[Long]("qy")) ->
        r.getAs[Double]("lift")).toMap
    assert(co.keySet == Set((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L)), s"$co")
    co.values.foreach(l => assert(l == 4.0))
    val anti = Stats.empiricalCopula(ev(flip = true)).collect()
      .map(r => (r.getAs[Long]("qx"), r.getAs[Long]("qy"))).toSet
    assert(anti == Set((0L, 3L), (1L, 2L), (2L, 1L), (3L, 0L)), s"$anti")
  }

  test("embedContamination: a planted duplicate of a probe reads " +
      "max_cos 1.0 and flags; orthogonal corpus reads 0") {
    // probe 0 = e1; corpus: 7 = copy of e1 (contaminated), 3 = e2
    // (orthogonal), 4 = -e1 (cos -1)
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (7L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = SimilaritySearch.embedContamination(emb).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("probe_id") == 0L)
    assert(r.getAs[Double]("max_cos") == 1.0)
    assert(r.getAs[Long]("nearest_id") == 7L)
    assert(r.getAs[Long]("n_flagged") == 1L)
  }
}
