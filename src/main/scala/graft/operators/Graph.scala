package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists derived from the warehouse (the
  * co-purchase / interaction graphs a feature pipeline mines). No graph
  * library: ranks and degrees are plain DataFrames, so every step is
  * Catalyst-planned (partial aggs, AQE) and the iteration state is
  * node-sized, never edge-sized.
  */
object Graph {

  /** Fixed-iteration PageRank (simplified: dangling mass leaks, as in
    * the classic map-reduce formulation). `edges` is a directed (src,
    * dst) list — undirected graphs union the reverse before calling.
    *
    * Scale shape: the edge list is deduped + checkpointed ONCE with its
    * out-degrees attached (the loop never re-derives static state);
    * each iteration is one edge⋈rank join (rank frame is node-sized —
    * AQE broadcasts it under the threshold) + one partial-agg shuffle
    * on dst. Per-iteration round(…, 9) pins both oracle engines to the
    * same doubles, so unordered in-neighbor sums cannot drift across
    * iterations.
    *
    * Iterations are a fixed count, not run-to-convergence: the result
    * is a deterministic function of the graph at any scale (and the
    * oracle unrolls the same count). */
  def pageRank(edges: DataFrame, iterations: Int = 5,
               damping: Double = 0.85): DataFrame = {
    val ed = edges.select("src", "dst").distinct()
      .withColumn("outdeg",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("src")))
      .localCheckpoint(true)
    val nodes = ed.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge list")
    val base = (1.0 - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val msum = ed.join(ranks, ed("src") === ranks("node"))
        .select(col("dst"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("dst").agg(sum("c").as("m"))
      // no checkpoint here: each iteration's ranks are consumed exactly
      // once (by the next), so the loop stays ONE lazy 5-stage plan —
      // only the multiply-referenced static frames above materialize
      ranks = nodes
        .join(msum, nodes("node") === msum("dst"), "left")
        .select(col("node"),
          round(lit(base) + lit(damping) * coalesce(col("m"), lit(0.0)), 9)
            .as("rank"))
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }

  /** Degree histogram: how many nodes have each (out-)degree — the
    * 30-second shape check on any mined graph. Two narrow partial-agg
    * rollups, output is degree-cardinality-sized. */
  def degreeHistogram(edges: DataFrame): DataFrame =
    edges.select("src", "dst").distinct()
      .groupBy("src").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))

  /** Connected-component size histogram of an edge list — the general
    * graph face of the dedup CC machinery (Dedup.dupClusters: driver
    * union-find under the edge limit, distributed min-label pointer
    * doubling above it; labels are min-node-id either way, matching the
    * oracle's reachability closure). Output is component-count-sized. */
  def components(edges: DataFrame): DataFrame =
    Dedup.dupClusters(edges.select(col("src").as("d1"), col("dst").as("d2")))
      .groupBy(col("cluster_id").as("label"))
      .agg(count(lit(1)).as("n_nodes"))
}
