package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("pricingSummary groups by flag+status with positive sums") {
    val out = Relational.pricingSummary(Tables.lineitem(spark, sf)).collect()
    assert(out.nonEmpty && out.length <= 6) // |returnflag| x |linestatus|
    out.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
    val total = out.map(_.getAs[Long]("count_order")).sum
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("revenueFilter pushes predicates to the parquet scan") {
    val df = Relational.revenueFilter(Tables.lineitem(spark, sf))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual"),
      s"expected pushed filters in:\n$plan")
    assert(df.collect().length == 1)
  }

  test("regionalRevenue broadcasts dims and matches manual total") {
    val df = Relational.regionalRevenue(Tables.orders(spark, sf),
      Tables.customer(spark, sf), Tables.nation(spark, sf), Tables.region(spark, sf))
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val sumOrders = df.agg(sum("order_count")).first().getLong(0)
    assert(sumOrders == Tables.orders(spark, sf).count())
  }

  test("topOrders is deterministic and descending") {
    val rows = Relational.topOrders(Tables.orders(spark, sf), 10).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("exceptAll removes exactly the filtered multiset") {
    val out = Relational.exceptAllByStatus(Tables.orders(spark, sf), "F").collect()
    assert(out.forall(_.getAs[String]("o_orderstatus") != "F"))
  }

  test("semijoin partitions customers exhaustively") {
    val df = Relational.customersByOrderExistence(
      Tables.customer(spark, sf), Tables.orders(spark, sf))
    val n = df.agg(sum("n")).first().getLong(0)
    assert(n == Tables.customer(spark, sf).count())
  }
}
