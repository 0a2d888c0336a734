package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {

  test("topK aggregates partially map-side (no full-row shuffle)") {
    val df = Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(TopKAggregator.topK(3)(col("o_totalprice"), col("o_orderkey")).as("top"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk") || plan.contains("ObjectHashAggregate"),
      s"expected partial aggregation in:\n$plan")
    assert(df.collect().forall(_.getSeq[Any](1).length <= 3))
  }

  test("topK equals the rank-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(spark, sf)
    val viaAgg = SparkEntryHelper.topkQuery(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_orderpriority", "o_totalprice", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }
}

object SparkEntryHelper {
  def topkQuery(spark: org.apache.spark.sql.SparkSession, d: String) =
    graft.SparkEntry.queries("q18_topk_per_group")(spark, d)
}
