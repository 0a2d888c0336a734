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

  /** round2(Σ revenue) in EXACT integer arithmetic (Exact.RevenueE4 —
    * the r12 tpch_q9 class: e4-grid sums rounded at e2 make ~1% of
    * groups representation coin tosses under double summation). */
  private def revenueSum: org.apache.spark.sql.Column =
    Exact.roundSumToCents(Exact.RevenueE4, 100).cast("double") / lit(100.0)

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
      .agg(revenueSum.as("revenue"))
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
      .agg(revenueSum.as("revenue"))
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
        sum(expr(s"case when p_type = 'PROMO' then ${Exact.RevenueE4}" +
          " else 0 end")).cast("double") /
        sum(expr(Exact.RevenueE4)).cast("double"), 6)
        .as("promo_revenue_pct"))

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
      .agg(revenueSum.as("total_revenue"))
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
      .agg(revenueSum.as("revenue"),
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
      .agg(revenueSum.as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(n)

  /** Q7 (volume shipping): bilateral trade revenue between two nations
    * by ship year — supplier in one, customer in the other, both
    * directions kept. Each nation filter binds ONE dim, so both are
    * applied BEFORE the fact joins (supplier and customer shrink to
    * ~2/25 of their rows pre-shuffle; at 100 TB that's the difference
    * between shuffling the whole customer table and a twenty-fifth of
    * it). The surviving dims are fixed-fraction-of-dim-sized, so AQE
    * broadcasts them at any reasonable scale; the orders⋈lineitem edge
    * is the one fact⋈fact shuffle. The cross-nation "(n1,n2) or
    * (n2,n1)" disjunction collapses to a post-join inequality test on
    * the two already-bound nation names — never a cross-table OR in
    * the join condition (which would force a BNLJ). */
  def q7(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
         supplier: DataFrame, nation: DataFrame,
         nationA: String = "NATION_1", nationB: String = "NATION_2",
         yearLo: String = "1996-01-01", yearHi: String = "1998-01-01")
      : DataFrame = {
    val two = nation.filter(col("n_name").isin(nationA, nationB))
    val supN = supplier.select("s_suppkey", "s_nationkey")
      .join(broadcast(two.select(col("n_nationkey"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    val custN = customer.select("c_custkey", "c_nationkey")
      .join(broadcast(two.select(col("n_nationkey").as("cnk"),
        col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cnk"))
      .select("c_custkey", "cust_nation")
    lineitem.filter(col("l_shipdate") >= yearLo && col("l_shipdate") < yearHi)
      .join(supN, col("l_suppkey") === col("s_suppkey"))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(custN, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(revenueSum.as("revenue"))
  }

  /** Q8 (national market share): of one region's revenue for one part
    * type, the fraction supplied by one nation, per order year — the
    * conditional-share-of-a-rollup shape (sum(when)/sum in ONE agg
    * pass, never two scans). The part-type filter prunes lineitem via
    * the partkey join (the most selective edge, so it runs first);
    * the region membership binds the CUSTOMER side while the share
    * test binds the SUPPLIER side — the two nation roles stay separate
    * broadcast joins, as in Q7. */
  def q8(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
         supplier: DataFrame, nation: DataFrame, region: DataFrame,
         part: DataFrame, regionName: String = "EUROPE",
         shareNation: String = "NATION_1",
         partType: String = "STANDARD"): DataFrame = {
    val regionNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("rnk"))
    val custIn = customer.select("c_custkey", "c_nationkey")
      .join(broadcast(regionNations), col("c_nationkey") === col("rnk"),
        "left_semi")
      .select("c_custkey")
    val supN = supplier.select("s_suppkey", "s_nationkey")
      .join(broadcast(nation.select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .select("s_suppkey", "supp_nation")
    lineitem
      .join(part.filter(col("p_type") === partType).select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(custIn, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(supN, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        sum(expr(s"case when supp_nation = '$shareNation' then " +
          s"${Exact.RevenueE4} else 0 end")).cast("double") /
        sum(expr(Exact.RevenueE4)).cast("double"), 6).as("mkt_share"))
  }

  /** Q13 (customer order-count distribution): how many customers
    * placed exactly k qualifying orders, INCLUDING k = 0 — the
    * count-preserving left-outer shape (count(o_orderkey) counts
    * non-null matches only, so unmatched customers land in the zero
    * bucket; an inner join would silently drop them). Two narrow aggs:
    * per-customer counts (keys-only shuffle), then the tiny
    * distribution rollup. At 100 TB the orders side is pre-filtered
    * before the join — the predicate never touches customer rows. */
  def q13(customer: DataFrame, orders: DataFrame,
          excludePriority: String = "5-LOW"): DataFrame =
    customer.select("c_custkey")
      .join(orders.filter(col("o_orderpriority") =!= excludePriority)
          .select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Q17 (small-quantity-order revenue): average yearly revenue lost
    * if small orders (below 20% of the part's average quantity) for
    * one brand were no longer filled. The correlated scalar subquery
    * ("avg quantity OF THIS PART") is decorrelated by hand into a
    * per-part aggregate JOINED back — and that aggregate runs over
    * only the brand's lineitems (a semi-join prune BEFORE the rollup:
    * the spec's subquery scans all lineitem per part; pruning first is
    * equivalent here because the outer query only consumes brand
    * parts, and it shrinks the agg input by ~1/|brands|). AQE
    * broadcasts the per-part threshold frame (one row per brand part —
    * dim-sized, not fact-sized). */
  def q17(lineitem: DataFrame, part: DataFrame,
          brand: String = "Brand#1"): DataFrame = {
    val brandParts = part.filter(col("p_brand") === brand)
      .select("p_partkey")
    val brandLines = lineitem
      .join(brandParts, col("l_partkey") === col("p_partkey"), "left_semi")
    val perPart = brandLines.groupBy(col("l_partkey").as("t_partkey"))
      .agg((avg("l_quantity") * 0.2).as("qty_cutoff"))
    brandLines
      .join(perPart, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_cutoff"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  /** Q21 (suppliers who kept orders waiting; l_returnflag = 'R' stands
    * in for the schema's missing commit/receipt dates): suppliers
    * whose line was RETURNED on a finished multi-supplier order where
    * NO OTHER supplier's line was returned — the one-EXISTS +
    * one-NOT-EXISTS composite. Both quantifiers become hash
    * semi-/anti-joins on orderkey with the "different supplier"
    * inequality riding as a residual condition (never in the hash key,
    * so the join stays an equi-join; the non-equi part filters matched
    * buckets). The probe side is pre-filtered to 'F' orders and 'R'
    * lines, so the big lineitem scan feeds the quantifiers once each. */
  def q21(supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
          n: Int = 20): DataFrame = {
    val li = lineitem.select("l_orderkey", "l_suppkey", "l_returnflag")
    val l1 = li.filter(col("l_returnflag") === "R")
      .join(orders.filter(col("o_orderstatus") === "F")
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
    val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
    val l3 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
    l1.join(l2, col("l_orderkey") === col("k2") &&
        col("l_suppkey") =!= col("s2"), "left_semi")
      .join(l3, col("l_orderkey") === col("k3") &&
        col("l_suppkey") =!= col("s3"), "left_anti")
      .join(supplier.select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(n)
  }

  /** Q22 (global sales opportunity; "no URGENT orders" stands in for
    * the spec's "no orders" — every test-data customer has ordered, so
    * the spec predicate would be vacuous): per nation, the count and
    * total balance of above-average-balance customers who never placed
    * an urgent order. The global threshold (avg over POSITIVE
    * balances) is a 1-row aggregate broadcast onto the customer scan —
    * a scalar that would be a correlated subquery in the spec text;
    * the "never urgent" quantifier is a hash anti-join against the
    * pre-filtered orders keys (keys-only shuffle). */
  def q22(customer: DataFrame, orders: DataFrame): DataFrame = {
    val threshold = customer.filter(col("c_acctbal") > 0.0)
      .agg(avg("c_acctbal").as("__avg"))
    customer.select("c_custkey", "c_nationkey", "c_acctbal")
      .crossJoin(broadcast(threshold))
      .filter(col("c_acctbal") > col("__avg"))
      .join(orders.filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        round(sum("c_acctbal"), 2).as("totacctbal"))
  }

  /** Q1 (pricing summary report) — the full eight-aggregate form (the
    * long-standing q1_agg entry carries only sum_qty). One partial-agg
    * pass over the date-pruned scan; every aggregate is algebraic, so
    * the map-side combine collapses 60k rows/partition to ≤|flag×status|
    * before the 6-row shuffle. Sums round to cents, averages to 4dp —
    * both sides of the oracle round identically so double summation
    * order can't flap the compare. */
  def q1(lineitem: DataFrame, cutoff: String = "2001-09-01"): DataFrame =
    lineitem.filter(col("l_shipdate") <= cutoff)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        revenueSum.as("sum_disc_price"),
        (Exact.roundSumToCents(s"(${Exact.RevenueE4})" +
            " * (100 + cast(floor(l_tax * 100 + 0.5) as bigint))", 10000)
          .cast("double") / lit(100.0)).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Q2 (minimum-cost supplier; the schema has no partsupp, so a
    * supplier's "cost" for a part is the minimum unit price at which
    * they actually shipped it — min(l_extendedprice/l_quantity) per
    * (part, supplier) mined from lineitem): for small parts, the
    * region's suppliers achieving the per-part minimum cost, richest
    * supplier first. The spec's correlated min subquery decorrelates
    * into a window min over the part key: the rollup combines map-side
    * first, so every post-scan shuffle carries pre-aggregated
    * (part, supplier) pairs — dim-sized rows, never lineitems — and
    * the window then re-clusters that tiny pair frame (no per-part
    * aggregate frame joined back). Unit costs round to 4dp BEFORE the
    * min/equality so the tie test is engine-stable. */
  def q2(part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
         nation: DataFrame, region: DataFrame,
         regionName: String = "EUROPE", ptype: String = "SMALL",
         maxSize: Int = 10, n: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val regionSup = supplier
      .join(broadcast(nation
          .join(broadcast(region.filter(col("r_name") === regionName)),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    // round4(price/qty) in EXACT integer arithmetic: price sits on the
    // cents grid and qty is a whole number, so the ratio's true value
    // lives on a finite grid FINER than the round digit — the reachable
    // half-case split engines on the r12 second-seed gate (123.89225 →
    // .8923 vs .8922). uc4 = floor((200·cents + q) / 2q) is the exact
    // half-up ten-thousandths value (all positive longs); round∘min =
    // min∘round by monotonicity, so min runs on the integers and one
    // double division lands both engines on the identical IEEE value.
    val uc4 = expr("(200 * cast(floor(l_extendedprice * 100 + 0.5)" +
      " as bigint) + cast(l_quantity as bigint))" +
      " div (2 * cast(l_quantity as bigint))")
    val offers = lineitem
      .join(part.filter(col("p_type") === ptype &&
            col("p_size") <= maxSize).select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg((min(uc4).cast("double") / lit(10000.0)).as("unit_cost"))
      .join(regionSup, col("l_suppkey") === col("s_suppkey"))
    offers
      .withColumn("__min",
        min("unit_cost").over(Window.partitionBy("l_partkey")))
      .filter(col("unit_cost") === col("__min"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("unit_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(n)
  }

  /** Q4 (order-priority checking; EXISTS(late line) becomes
    * EXISTS(returned line) — the schema carries no commit/receipt
    * dates, l_returnflag = 'R' is the "something went wrong" signal):
    * quarter's orders per priority having at least one returned line.
    * The EXISTS quantifier is a hash semi-join probing orderkeys-only
    * (the returned-lines side projects to the key before the
    * shuffle). */
  def q4(orders: DataFrame, lineitem: DataFrame,
         quarterLo: String = "1996-01-01",
         quarterHi: String = "1996-04-01"): DataFrame =
    orders.filter(col("o_orderdate") >= quarterLo &&
        col("o_orderdate") < quarterHi)
      .join(lineitem.filter(col("l_returnflag") === "R")
          .select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))

  /** Q6 (forecasting revenue change): the one-table what-if — revenue
    * that would vanish if mid-band discounts on small-quantity lines
    * were dropped for a year. Pure scan-side predicates (date range,
    * discount band, quantity cap ALL push to parquet) collapsing to a
    * single row; the whole query is one map-side partial sum. Discount
    * literals hit the generator's exact 2dp bucket doubles, so the
    * band test is engine-stable. */
  def q6(lineitem: DataFrame, yearLo: String = "1996-01-01",
         yearHi: String = "1997-01-01", discLo: Double = 0.05,
         discHi: Double = 0.07, maxQty: Double = 24.0): DataFrame =
    lineitem.filter(col("l_shipdate") >= yearLo &&
        col("l_shipdate") < yearHi &&
        col("l_discount") >= discLo && col("l_discount") <= discHi &&
        col("l_quantity") < maxQty)
      .agg((Exact.roundSumToCents(
          "cast(floor(l_extendedprice * 100 + 0.5) as bigint)" +
            " * cast(floor(l_discount * 100 + 0.5) as bigint)", 100)
        .cast("double") / lit(100.0))
        .as("revenue"))

  /** Q9 (product-type profit; no partsupp.ps_supplycost — the cost of
    * a shipped line is proxied as costFactor × p_retailprice ×
    * l_quantity): profit per supplier nation per order year over parts
    * whose name carries one color word. Join order shrinks the fact
    * frame first (selective part filter via the smallest join), nation
    * stays an explicit broadcast (bounded dim), orders joins last
    * carrying only (orderkey, orderdate). Year extraction groups on an
    * integer, not a timestamp. */
  def q9(orders: DataFrame, lineitem: DataFrame, part: DataFrame,
         supplier: DataFrame, nation: DataFrame,
         nameWord: String = "red",
         costFactor: Double = 0.8): DataFrame = {
    // the exact-revenue path (Exact.roundSumToCents) carries the cost
    // factor as an integer PERCENT so the profit term stays on the e4
    // grid; an off-grid factor (e.g. 0.825) would silently snap to the
    // nearest percent — refuse it instead (r12 ADVICE)
    val costPct = (costFactor * 100).round
    require(math.abs(costFactor * 100 - costPct) < 1e-9,
      s"costFactor must sit on the percent grid (n/100), got $costFactor")
    lineitem
      .join(part.filter(col("p_name").contains(nameWord))
          .select("p_partkey", "p_retailprice"),
        col("l_partkey") === col("p_partkey"))
      .join(supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((Exact.roundSumToCents(s"(${Exact.RevenueE4}) - " +
          s"$costPct * cast(floor(p_retailprice * 100" +
          " + 0.5) as bigint) * cast(l_quantity as bigint)", 100)
        .cast("double") / lit(100.0)).as("profit"))
  }

  /** Q11 (important stock identification; stock value per part is
    * mined from lineitem as sum(price × qty) over one nation's
    * suppliers — no partsupp): parts whose value exceeds a fraction of
    * the nation's total. The spec's scalar subquery in HAVING is the
    * q15/q22 pattern: a 1-row aggregate broadcast back onto the
    * per-part frame (never a second scan). Per-part values round to
    * cents BEFORE the total and the threshold compare, so the
    * cut-line is identical in both engines. */
  def q11(lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
          nationName: String = "NATION_9",
          fraction: Double = 0.0015): DataFrame = {
    val natSup = supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val perPart = lineitem
      .join(natSup, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(round(sum(col("l_extendedprice") * col("l_quantity")), 2)
        .as("value"))
    perPart
      .crossJoin(broadcast(perPart
        .agg(round(sum("value") * fraction, 2).as("__cut"))))
      .filter(col("value") > col("__cut"))
      .select("p_partkey", "value")
  }

  /** Q16 (supplier-relationship count; part–supplier relationships are
    * mined from lineitem, and "complaint" suppliers are the
    * negative-balance ones — the schema has no comment text): distinct
    * suppliers per (brand, type, size) bucket for non-excluded parts,
    * skipping flagged suppliers. The NOT IN becomes a hash anti-join
    * on the tiny flagged-key set; count(DISTINCT) partial-aggregates
    * per (bucket, suppkey) before the final rollup. */
  def q16(part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
          excludeBrand: String = "Brand#13",
          excludeType: String = "PROMO",
          maxSize: Int = 25): DataFrame =
    lineitem.select("l_partkey", "l_suppkey")
      .join(part.filter(col("p_brand") =!= excludeBrand &&
          col("p_type") =!= excludeType && col("p_size") <= maxSize)
          .select("p_partkey", "p_brand", "p_type", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .join(supplier.filter(col("s_acctbal") < 0.0).select("s_suppkey"),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))

  /** Q20 (suppliers with excess stock; availqty has no source table,
    * so "excess" is a supplier shipping MORE than excessFactor × the
    * part's per-supplier average that year — the same
    * share-above-the-mean quantifier shape): one nation's suppliers
    * who over-shipped some name-matched part. The spec's nested INs
    * become: a semi-join part prune, a map-side-combined
    * (part, supplier) rollup, a window avg re-clustering the
    * pre-aggregated pair frame on the part key, and a final semi-join
    * into supplier. Quantity sums are exact integer-valued doubles, so
    * the strict > threshold is engine-stable. */
  def q20(supplier: DataFrame, nation: DataFrame, part: DataFrame,
          lineitem: DataFrame, namePrefix: String = "blue",
          yearLo: String = "1996-01-01", yearHi: String = "1997-01-01",
          excessFactor: Double = 1.5,
          nationName: String = "NATION_9"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shipped = lineitem
      .filter(col("l_shipdate") >= yearLo && col("l_shipdate") < yearHi)
      .join(part.filter(col("p_name").startsWith(namePrefix))
          .select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum("l_quantity").as("qty"))
    val over = shipped
      .withColumn("__avg",
        avg("qty").over(Window.partitionBy("l_partkey")))
      .filter(col("qty") > lit(excessFactor) * col("__avg"))
      .select("l_suppkey")
    supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .join(over, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_name", "s_acctbal")
  }
}
