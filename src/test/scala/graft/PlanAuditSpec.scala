package graft

import org.apache.spark.sql.functions._

/** Plan-shape regression tests: the properties that make these operators
  * scale (pushdown, pruning, broadcast, TakeOrdered, partial agg) are
  * asserted on the executed plan so a refactor can't silently trade them
  * away. (.explain("formatted") audit, SURVEY §4.)
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("src_parquet_scan: filter and projection reach the parquet scan") {
    val p = plan("src_parquet_scan")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,49.0)]"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"))
  }

  test("q3_join_broadcast: dims broadcast, no fact-side sort-merge join") {
    val p = plan("q3_join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q4_topn: top-N is TakeOrderedAndProject, not a global sort") {
    val p = plan("q4_topn")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("ann_bruteforce: corpus is never shuffled, top-k via TakeOrdered") {
    val p = plan("ann_bruteforce")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange hashpartitioning"))
  }

  test("q1_agg: aggregation is partial (map-side) before the exchange") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum") || p.contains("partial_count"))
  }

  test("snk_partitioned_write: readback scan prunes partitions") {
    val df = SparkEntry.queries("snk_partitioned_write")(spark, sf)
    df.collect() // materialize (the write happens at query build)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(o_year"),
      s"expected o_year partition filter in:\n$p")
  }

  test("ann_lsh: probe scan prunes to the query's bucket partition") {
    val df = SparkEntry.queries("ann_lsh")(spark, sf)
    df.collect() // materialize (the bucketed layout write happens at build)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(bucket"),
      s"expected bucket partition filter in:\n$p")
    // an actual equality prune, not just the isnotnull the line above matches
    assert("\\(bucket#\\d+L? = ".r.findFirstIn(p).isDefined,
      s"expected bucket equality partition filter in:\n$p")
  }

  test("dd_embed_neardup_lsh: candidates come from an equi-join, not an all-pairs loop") {
    val p = plan("dd_embed_neardup_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"LSH pair generation must not be an all-pairs BNLJ:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("ann_ivf: cell assignment evaluated once, top-k via TakeOrdered") {
    val p = plan("ann_ivf")
    assert(p.contains("TakeOrderedAndProject"))
    // the coalesce(..., -1) wrapper keeps the inferred isnotnull(cell)
    // constraint from re-evaluating the assignment below the exchange
    val evals = "graft_nearest_centroid".r.findAllIn(p).size
    assert(evals == 1, s"expected 1 assignment eval in plan, got $evals:\n$p")
  }

  test("lam_anomaly_join + sp_nearest_join: small sides broadcast") {
    assert(plan("lam_anomaly_join").contains("BroadcastHashJoin"))
    assert(plan("sp_nearest_join").contains("BroadcastNestedLoopJoin"))
  }

  test("tx_contamination: benchmark side broadcast, corpus never nested-loop joined") {
    val p = plan("tx_contamination")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark shingle set must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("entry flagship runs and returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
