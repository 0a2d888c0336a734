package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Flagship composite analytics — the classic TPC-H shapes Q3/Q5/Q10
  * adapted to this star schema (o_orderpriority stands in for the
  * missing o_shippriority). These exercise the engine end-to-end: multi
  * dim broadcast joins, selective date/flag predicates pushed to the
  * scans, partial-agg revenue rollups, and TakeOrderedAndProject top-n
  * (never a global sort).
  *
  * Join order follows the star: facts join facts on their shared key
  * ONCE (orders⋈lineitem carries the only big shuffle — or none, over
  * the bucketed layout). Only the bounded dims (nation, region —
  * fixed-cardinality at any scale) carry explicit broadcast hints;
  * customer/supplier grow with the data, so their join strategy is
  * left to AQE (broadcast at test scale, shuffle join at 100 TB).
  */
object Tpch {

  private def revenue: org.apache.spark.sql.Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Q3 (shipping priority): unshipped-order revenue for one market
    * segment around a cutoff date, top-n by revenue. */
  def q3(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
         segment: String = "BUILDING", cutoff: String = "1996-03-15",
         n: Int = 10): DataFrame =
    lineitem.filter(col("l_shipdate") > cutoff)
      .join(orders.filter(col("o_orderdate") < cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.filter(col("c_mktsegment") === segment)
          .select("c_custkey"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(revenue), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(n)

  /** Q5 (local supplier volume): revenue where customer and supplier
    * share a nation, per nation of one region, over one year. */
  def q5(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
         supplier: DataFrame, nation: DataFrame, region: DataFrame,
         regionName: String = "ASIA", yearLo: String = "1996-01-01",
         yearHi: String = "1997-01-01"): DataFrame = {
    val nations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    lineitem
      .join(orders.filter(col("o_orderdate") >= yearLo &&
          col("o_orderdate") < yearHi),
        col("l_orderkey") === col("o_orderkey"))
      .join(supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(revenue), 2).as("revenue"))
  }

  /** Q14 (promotion effect): share of one month's revenue that came
    * from promo-type parts — a conditional aggregate over the
    * lineitem⋈part join, collapsing to ONE row. The month predicate
    * pushes to the lineitem scan before the join; part's join strategy
    * is AQE's call (it grows with scale). */
  def q14(lineitem: DataFrame, part: DataFrame,
          monthLo: String = "1996-09-01",
          monthHi: String = "1996-10-01"): DataFrame =
    lineitem.filter(col("l_shipdate") >= monthLo &&
        col("l_shipdate") < monthHi)
      .join(part.select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO", revenue).otherwise(lit(0.0))) /
        sum(revenue), 6).as("promo_revenue_pct"))

  /** Q18 (large-volume customers): orders whose total quantity exceeds
    * a threshold, with their customer, top-n by order value. The
    * HAVING subquery is a partial-agg rollup of lineitem (narrow
    * (orderkey, qty) shuffle) whose tiny survivor set then drives the
    * orders/customer joins — AQE broadcasts it, so neither fact table
    * shuffles for the join; top-n is TakeOrderedAndProject. Per-order
    * quantity is scale-invariant, so the threshold keeps its meaning
    * at any SF. */
  def q18(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
          qtyThreshold: Double = 300.0, n: Int = 20): DataFrame = {
    val big = lineitem.groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > qtyThreshold)
    orders.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer.select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        round(col("total_qty"), 4).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(n)
  }

  /** Q12 (shipping priority audit; ref queries/q12.sql adapted —
    * l_linestatus stands in for the schema's missing l_shipmode): per
    * line status in a ship-date year, how many lines belong to
    * critical-priority orders (1-URGENT / 2-HIGH) vs the rest. The
    * date range is the ONLY selective predicate and it reaches the
    * lineitem scan; the conditional counts are a single partial-agg
    * pass over the joined frame (casewhen inside sum — never two
    * joins or two scans). orders joins on its key with no filter, so
    * at 100 TB this is the one fact⋈fact shuffle (or zero over the
    * bucketed layout) — the 2-row output is driver-free otherwise. */
  def q12(orders: DataFrame, lineitem: DataFrame,
          yearLo: String = "1996-01-01",
          yearHi: String = "1997-01-01"): DataFrame = {
    val crit = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    lineitem.filter(col("l_shipdate") >= yearLo &&
        col("l_shipdate") < yearHi)
      .join(orders.select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(sum(when(crit, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(crit, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** Q10 (returned items): lost revenue per customer from returns in a
    * quarter, top-n worst. */
  def q10(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
          nation: DataFrame, qLo: String = "1996-10-01",
          qHi: String = "1997-01-01", n: Int = 20): DataFrame =
    lineitem.filter(col("l_returnflag") === "R")
      .join(orders.filter(col("o_orderdate") >= qLo &&
          col("o_orderdate") < qHi),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(round(sum(revenue), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(n)
}
