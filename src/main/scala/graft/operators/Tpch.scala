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

  /** Q15 (top supplier; ref queries/q15.sql adapted): the supplier(s)
    * achieving the MAXIMUM quarterly revenue — the "equal to a
    * subquery max" shape, with ties kept like the spec's view form.
    * The revenue rollup is one narrow (suppkey, revenue) partial-agg
    * shuffle off the date-pruned scan; the max is a 1-row broadcast
    * back onto that supplier-count-sized frame (never a second scan,
    * never a global sort), and the supplier dim joins the ≤handful of
    * survivors (AQE broadcasts them). Revenues compare ROUNDED to
    * cents so the tie test is engine-stable. */
  def q15(supplier: DataFrame, lineitem: DataFrame,
          quarterLo: String = "1996-01-01",
          quarterHi: String = "1996-04-01"): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= quarterLo && col("l_shipdate") < quarterHi)
      .groupBy("l_suppkey")
      .agg(round(sum(revenue), 2).as("total_revenue"))
    rev.crossJoin(broadcast(rev.agg(max("total_revenue").as("__max"))))
      .filter(col("total_revenue") === col("__max"))
      .join(supplier.select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Q19 (discounted revenue across brand/size/quantity brackets; ref
    * queries/q19.sql adapted — p_container is absent, p_size brackets
    * stand in): a disjunction of three conjunctive brackets collapsing
    * to ONE revenue row. The join stays a plain equi-join on partkey
    * with the disjunction as a post-join filter; the parts of the
    * predicate that bind ONE side only (quantity ≤ the widest bracket,
    * size ≤ the widest bracket) are ALSO applied per-side so each scan
    * prunes before the shuffle — the classic OR-pushdown decomposition
    * done by hand because no engine pushes a cross-table OR. */
  def q19(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val bracket =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    lineitem.filter(col("l_quantity").between(1, 30))
      .join(part.filter(col("p_size").between(1, 15) &&
          col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
          .select("p_partkey", "p_brand", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .filter(bracket)
      .agg(round(sum(revenue), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
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
