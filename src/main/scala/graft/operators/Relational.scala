package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core batch-relational operators.
  *
  * Re-expresses the reference's batch analytics surface (reference:
  * work/Intro_pySpark.ipynb — groupBy/agg, joins, unionByName, exceptAll;
  * work/analysis_sectors_by_location.ipynb — merge + top-N counts) as
  * declarative DataFrame transforms so Catalyst keeps pushdown, pruning and
  * join planning. Small dimension tables are explicitly broadcast: on a
  * 1000-executor cluster the fact-side stays shuffle-free for those joins.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: one shuffle, map-side partial aggs.
    * Doubles rounded so results are stable across partition orderings. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        (Exact.roundSumToCents(Exact.RevenueE4, 100).cast("double")
          / lit(100.0)).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q6-style revenue filter: predicate + projection both push to the
    * parquet scan (verify via PushedFilters/ReadSchema in explain). */
  def revenueFilter(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(
        col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") <  lit("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg((Exact.roundSumToCents(
          "cast(floor(l_extendedprice * 100 + 0.5) as bigint)" +
            " * cast(floor(l_discount * 100 + 0.5) as bigint)", 100)
        .cast("double") / lit(100.0)).as("revenue"))

  /** Star join: fact ⋈ dims with explicit broadcast on the small sides —
    * no shuffle of the fact table for nation/region at any scale. */
  def regionalRevenue(orders: DataFrame, customer: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        round(sum("o_totalprice"), 2).as("total_revenue"),
        count(lit(1)).as("order_count"))

  /** Deterministic top-N (ties broken on the key): TakeOrderedAndProject,
    * i.e. per-partition heaps + driver merge, never a full sort. */
  def topOrders(orders: DataFrame, n: Int): DataFrame =
    orders
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(n)

  /** Distinct cardinalities per group (exact; see Stats for approx_count_distinct). */
  def distinctPartsPerFlag(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag")
      .agg(
        countDistinct("l_partkey").as("distinct_parts"),
        countDistinct("l_suppkey").as("distinct_supps"))

  /** unionByName + distinct (reference: work/Intro_pySpark.ipynb unionByName). */
  def unionDistinctSegments(customer: DataFrame): DataFrame =
    customer.filter(col("c_acctbal") > 1000)
      .unionByName(customer.filter(col("c_mktsegment") === "BUILDING"))
      .distinct()
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"))

  /** Multiset difference (reference: work/Intro_pySpark.ipynb exceptAll). */
  def exceptAllByStatus(orders: DataFrame, status: String): DataFrame =
    orders.exceptAll(orders.filter(col("o_orderstatus") === status))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))

  /** Multiset intersection — completes the set-op family (union/except/
    * intersect). */
  def intersectSegments(customer: DataFrame): DataFrame =
    customer.filter(col("c_acctbal") > 1000)
      .intersectAll(customer.filter(col("c_mktsegment") === "BUILDING"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"))

  /** when/otherwise banding + conditional aggregation (reference:
    * work/spark_processor.py alert-level chains, here on prices). */
  def priceBands(orders: DataFrame): DataFrame =
    orders
      .withColumn("price_band",
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 200000, "mid")
          .otherwise("high"))
      .groupBy("o_orderstatus", "price_band")
      .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))

  /** Rollup subtotals over the region/nation hierarchy. */
  def revenueRollup(orders: DataFrame, customer: DataFrame,
                    nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "o_totalprice")
      // Column-based rollup: the String overload trips Spark 4.1's
      // ambiguous-self-join detection after multi-way joins.
      .rollup(col("r_name"), col("n_name"))
      .agg(round(sum("o_totalprice"), 2).as("total_revenue"),
        count(lit(1)).as("order_count"))

  /** Full cube over the same hierarchy: all four grouping-set combos in
    * one pass (Expand feeds one partial-agg shuffle — Spark never scans
    * the input once per grouping set). */
  def revenueCube(orders: DataFrame, customer: DataFrame,
                  nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "o_totalprice")
      .cube(col("r_name"), col("n_name"))
      .agg(round(sum("o_totalprice"), 2).as("total_revenue"),
        count(lit(1)).as("order_count"))

  /** Semi/anti join coverage: customers tagged by order existence. The fact
    * side is only probed, never materialized into the output. */
  def customersByOrderExistence(customer: DataFrame, orders: DataFrame): DataFrame = {
    val key = col("c_custkey") === col("o_custkey")
    customer.join(orders, key, "left_semi").withColumn("has_orders", lit(true))
      .unionByName(
        customer.join(orders, key, "left_anti").withColumn("has_orders", lit(false)))
      .groupBy("c_nationkey", "has_orders")
      .agg(count(lit(1)).as("n"))
  }

  /** NULL-SAFE equality join (`<=>` / IS NOT DISTINCT FROM): nullable
    * join keys where NULL must MATCH the dimension's explicit NULL row
    * instead of silently dropping — the "uncategorized bucket" join a
    * plain equi-join can't express. Still hash-joinable (null-safe
    * equality is an equi-key to Spark), so it broadcasts/shuffles like
    * any equi-join — no BNLJ. */
  def nullSafeCategorize(facts: DataFrame, dim: DataFrame,
                         factKey: String, dimKey: String,
                         label: String): DataFrame =
    facts.join(dim, facts(factKey) <=> dim(dimKey))
      .groupBy(label)
      .agg(count(lit(1)).as("n"))

  /** Correlated EXISTS / NOT EXISTS: customers that ordered at least once
    * but never inside [lo, hi) — the lapsed-customer query. Both
    * subqueries compile to semi/anti joins (no per-row subquery
    * execution); the anti side's date predicate is pushed to its scan,
    * so the window probe reads only the window's partitions under a
    * date-partitioned layout. */
  def lapsedCustomers(customer: DataFrame, orders: DataFrame,
                      lo: String, hi: String): DataFrame = {
    val all = orders.select("o_custkey")
    val inWin = orders
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_custkey")
    customer
      .join(all, col("c_custkey") === all("o_custkey"), "left_semi")
      .join(inWin, col("c_custkey") === inWin("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  /** Self-join: co-occurring lineitem pairs within an order (single shuffle
    * on the shared key; the l1.ln < l2.ln predicate halves the pair space). */
  def lineitemPairCount(lineitem: DataFrame): DataFrame = {
    val a = lineitem.select(col("l_orderkey"), col("l_linenumber").as("ln1"))
    val b = lineitem.select(col("l_orderkey"), col("l_linenumber").as("ln2"))
    a.join(b, "l_orderkey")
      .filter(col("ln1") < col("ln2"))
      .agg(count(lit(1)).as("pair_count"))
  }

  /** Bounded cartesian product over two tiny dims (reference:
    * work/Projet/preparation_noaa.ipynb cross join of zones × stations). */
  def regionNationCombos(region: DataFrame, nation: DataFrame): DataFrame =
    region.crossJoin(nation)
      .groupBy("r_name")
      .agg(count(lit(1)).as("combos"))

  /** Pivot: event counts per day × type, explicit value list so the
    * output schema is static (no extra distinct pass, deterministic
    * columns at any scale). */
  def pivotEventCounts(events: DataFrame): DataFrame =
    events
      .withColumn("day", dayofmonth(col("ts")))
      .groupBy("day")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))

  /** UNPIVOT — the inverse of [[pivotEventCounts]] (wide day×type count
    * matrix back to the long (day, event_type, n) form; the melt step
    * every BI export / normalization pass needs). Spark's native
    * `unpivot` plans as a row-local Expand — one output row per cell,
    * NO shuffle beyond the pivot's own aggregation, and round-trips the
    * pivot exactly (spec + oracle). Pivot's absent cells surface as
    * null counts and are dropped to mirror the long form. */
  def unpivotEventCounts(events: DataFrame): DataFrame =
    pivotEventCounts(events)
      .unpivot(Array(col("day")),
        Seq("click", "error", "purchase", "signup", "view").map(col).toArray,
        "event_type", "n")
      .filter(col("n").isNotNull)

  /** Null handling (reference: work/analysis_sectors_by_location.ipynb
    * dropna after merge): inject deterministic nulls, then compare
    * na.fill vs na.drop aggregates in one result. */
  def nullHandling(events: DataFrame): DataFrame = {
    val withNulls = events.withColumn("v",
      when(col("value") < 50, lit(null)).otherwise(col("value")))
    val filled = withNulls.na.fill(Map("v" -> 0.0))
      .agg(count(lit(1)).as("n_filled_rows"), round(sum("v"), 2).as("sum_filled"))
    val dropped = withNulls.na.drop(Seq("v"))
      .agg(count(lit(1)).as("n_kept_rows"), round(sum("v"), 2).as("sum_kept"))
    filled.crossJoin(dropped)
  }

  /** Full-outer join coverage: order totals per customer including
    * order-less customers and (synthetically) customer-less orders. */
  def customerOrderFullOuter(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"), "full_outer")
      .groupBy(col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        count(col("c_custkey")).as("n_customer_rows"))

  /** Timestamp parse/format round-trip (the reference parsed string
    * timestamps with a Python UDF — here native to_timestamp/date_format). */
  def timestampRoundtrip(orders: DataFrame): DataFrame =
    orders
      .withColumn("s", date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("parsed", to_timestamp(col("s"), "yyyy-MM-dd HH:mm:ss"))
      .groupBy(year(col("parsed")).as("y"))
      .agg(count(lit(1)).as("n"),
        min(col("s")).as("min_s"))

  /** Relational DIVISION — "customers with orders in EVERY month of the
    * window" (the universal-quantifier join shape: ÷ in the algebra,
    * the one classic operator the join family above doesn't cover; NOT
    * EXISTS(NOT EXISTS(...)) in textbook SQL). Implemented as the
    * count-matching form, which is one partial-agg pass over the
    * (customer, month) distinct frame + a 1-row divisor broadcast —
    * the doubly-correlated subquery form would be two data-sized
    * anti-joins. The divisor is DERIVED (distinct months present), so
    * the operator stays correct when a month is missing from the data
    * entirely. Output: qualifying customers + their active-month and
    * order counts. */
  def divisionActiveEveryMonth(orders: DataFrame,
                               lo: String = "1996-01-01",
                               hi: String = "1996-04-01"): DataFrame = {
    val inWin = orders
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
    val divisor = inWin.select("month").distinct()
      .agg(count(lit(1)).as("n_months"))
    inWin
      .groupBy("o_custkey")
      .agg(countDistinct("month").as("months_active"),
        count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(divisor))
      .filter(col("months_active") === col("n_months"))
      .select(col("o_custkey"), col("months_active"), col("n_orders"))
  }

  /** Market-basket ASSOCIATION RULES over order contents (the retail
    * staple: support / confidence / lift for item pairs, Apriori's
    * level-2 cut): the within-order pair join is bounded by
    * items-per-order (never corpus-quadratic — the same
    * same-key-self-join shape as the co-supply graph), supports are
    * one partial-agg pass each, and the order total rides in as a
    * 1-row broadcast. Lift and confidence stay exact integer ratios
    * (identical doubles on any engine), so the top-k cut —
    * TakeOrderedAndProject with the (i1, i2) tiebreak, never a global
    * sort — is deterministic. minSupport prunes the pair frame BEFORE
    * the metric joins. */
  def associationRules(lineitem: DataFrame, minSupport: Int = 2,
                       topK: Int = 20): DataFrame = {
    val items = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
      .distinct()
    val nOrders = items.select("ok").distinct()
      .agg(count(lit(1)).as("n_orders"))
    val supp = items.groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairs = items.select(col("ok"), col("item").as("i1"))
      .join(items.select(col("ok").as("ok2"), col("item").as("i2")),
        col("ok") === col("ok2") && col("i1") < col("i2"))
      .groupBy("i1", "i2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
    pairs
      .join(supp.select(col("item").as("i1"), col("n_item").as("n1")), "i1")
      .join(supp.select(col("item").as("i2"), col("n_item").as("n2")), "i2")
      .crossJoin(broadcast(nOrders))
      .select(col("i1"), col("i2"), col("n_pair"), col("n1"), col("n2"),
        round(col("n_pair") / col("n1").cast("double"), 6)
          .as("confidence"),
        round(col("n_pair").cast("double") * col("n_orders") /
          (col("n1") * col("n2")), 6).as("lift"))
      .orderBy(col("lift").desc, col("i1"), col("i2"))
      .limit(topK)
  }

  /** Month-over-month revenue growth per order priority — the BI
    * staple (period deltas on a calendar rollup). ONE partial-agg
    * shuffle collapses the corpus to the (priority × month) frame
    * (exact integer cents — no float drift into the lag); the lag
    * window rides that calendar-bounded frame, partitioned by
    * priority so no single-partition sort. First month emits null
    * growth (no fabricated 0). */
  /** RECURSIVE-HIERARCHY FLATTEN by pointer doubling — the
    * recursive-CTE capability Spark SQL lacks, re-expressed the way a
    * distributed engine should (a naive parent-at-a-time loop pays one
    * join PER LEVEL; pointer doubling squares the jump each round, so
    * a depth-D forest settles in ⌈log₂D⌉ joins — 6 rounds cover depth
    * 64, beyond any div-10 chain a 64-bit key can produce): synthetic
    * forest parent(c) = c div 10 (roots c < 10 — guaranteed present
    * under contiguous TPC-H keys), state (node → ancestor, distance)
    * initialized one hop up, each round joins the state against itself
    * to compose jumps; roots self-loop at distance 0, so composition
    * is idempotent once settled. Per-round localCheckpoint cuts the
    * doubling lineage (the [[graft.operators.Dedup]] CC discipline).
    * Output is the depth histogram + distinct-root count per depth —
    * bounded by max depth, not corpus size. */
  def hierarchyFlatten(customer: DataFrame, rounds: Int = 6): DataFrame = {
    var state = customer.select(col("c_custkey").as("node"),
        when(col("c_custkey") < 10, col("c_custkey"))
          .otherwise(expr("c_custkey div 10")).as("anc"),
        when(col("c_custkey") < 10, 0L).otherwise(1L).as("d"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val lookup = state.select(col("node").as("anc"),
        col("anc").as("anc2"), col("d").as("d2"))
      state = state.join(lookup, Seq("anc"))
        .select(col("node"), col("anc2").as("anc"),
          (col("d") + col("d2")).as("d"))
        .localCheckpoint(true)
    }
    state.groupBy(col("d").as("depth"))
      .agg(count(lit(1)).as("n_nodes"),
        countDistinct("anc").as("n_roots"))
  }

  /** MAP-type construct/explode round trip — the complex-type surface
    * w7_nested_flatten covers for structs/arrays, exercised for MAPs
    * (the natural shape for sparse per-key aggregates riding inside
    * one row — feature maps, per-status rollups): per returnflag,
    * the (linestatus → revenue) map builds from the ALREADY-AGGREGATED
    * cell frame via sort_array(collect_list(struct)) → map_from_entries
    * (sorting before map construction makes the entry order — and so
    * the explode order and any map serialization — deterministic on
    * any partitioning; collect_list alone would not be), then explodes
    * back to rows the oracle reproduces from plain SQL. Cell-bounded
    * frames after one corpus rollup; exact cent longs. */
  def mapAggRevenue(lineitem: DataFrame): DataFrame = {
    val cell = lineitem
      .groupBy(col("l_returnflag").as("flag"),
        col("l_linestatus").as("status"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .as("cents"))
    cell.groupBy("flag")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("status"), col("cents"))))).as("m"))
      .select(col("flag"), size(col("m")).cast("long").as("n_statuses"),
        explode(col("m")).as(Seq("status", "cents")))
      .select(col("flag"), col("status"), col("n_statuses"),
        round(col("cents") / 100.0, 2).as("revenue"))
  }

  /** ARRAY HIGHER-ORDER-FUNCTION order profile — the codegen'd
    * array-lambda surface (aggregate / filter / element_at over a
    * sorted per-order price array; the same HOF machinery the
    * embedding and multimodal operators lean on, exercised as a plain
    * relational contract): one corpus rollup collects each order's
    * cent prices, sort_array pins deterministic order, every derived
    * stat is a lambda over the array — no second shuffle, no UDF.
    * Exact integer cents end to end; the oracle recomputes the same
    * stats from the flat rows. */
  def arrayHofOrderStats(lineitem: DataFrame,
                         priceCut: Long = 100000L): DataFrame = {
    lineitem.groupBy(col("l_orderkey").as("orderkey"))
      .agg(sort_array(collect_list(
        round(col("l_extendedprice") * 100).cast("long"))).as("arr"))
      .select(col("orderkey"),
        size(col("arr")).cast("long").as("n_lines"),
        expr("aggregate(arr, CAST(0 AS BIGINT), (acc, x) -> acc + x)")
          .as("total_cents"),
        size(expr(s"filter(arr, x -> x > ${priceCut}L)")).cast("long")
          .as("n_expensive"),
        expr("element_at(arr, -1)").as("max_cents"),
        expr("element_at(arr, -1) - element_at(arr, 1)")
          .as("span_cents"))
  }

  /** ROLLUP with GROUPING_ID disambiguation — the semantic q10_rollup
    * leaves implicit (a NULL in a rolled-up result is AMBIGUOUS: is it
    * the subtotal row, or a real NULL grouping value? Every BI layer
    * on top of a rollup needs grouping_id to tell them apart, and the
    * bit order — first grouping column = most significant bit — is a
    * contract worth locking against the oracle engine): revenue over
    * rollup(flag, status) with gid and a human level label. Exact cent
    * sums; one shuffle (rollup is one Expand + one agg). */
  def rollupGroupingId(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_returnflag").as("flag"),
        col("l_linestatus").as("status"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .rollup("flag", "status")
      .agg(sum("cents").as("c"), grouping_id().as("gid"))
      .select(col("flag"), col("status"), col("gid"),
        when(col("gid") === 0, "cell").when(col("gid") === 1, "flag_total")
          .otherwise("grand_total").as("level"),
        round(col("c") / 100.0, 2).as("revenue"))

  /** SKYLINE (Pareto-dominance) query over parts — the multi-objective
    * operator relational algebra lacks a primitive for (Börzsönyi et
    * al.'s SKYLINE OF: the parts no other part beats on BOTH axes —
    * here smaller size AND higher retail price; the frontier every
    * "best tradeoff" product query wants): p survives iff no q has
    * size ≤ p.size ∧ price ≥ p.price with one strict.
    *
    * NOT the naive quadratic dominance self-join: in 2D the skyline is
    * a CUMULATIVE-MAX scan — collapse to one row per size (its max
    * price + count at the max), then a point survives iff its price
    * STRICTLY exceeds the running max over smaller sizes. One rollup
    * shuffle + one size-ordered window over the size-bounded frame
    * (p_size has bounded cardinality — 50 values in TPC-H); exact
    * cent longs. */
  def skylineParts(part: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySize = part
      .select(col("p_size").cast("long").as("size"),
        round(col("p_retailprice") * 100).cast("long").as("cents"))
      .groupBy("size")
      .agg(max("cents").as("best"), count(lit(1)).as("n_at_size"))
    val perPrice = part
      .select(col("p_size").cast("long").as("p_sz"),
        round(col("p_retailprice") * 100).cast("long").as("cents"))
      .groupBy("p_sz", "cents").agg(count(lit(1)).as("n_parts"))
    val w = Window.orderBy("size")
      .rowsBetween(Window.unboundedPreceding, -1)
    bySize
      .withColumn("prevmax", coalesce(max("best").over(w), lit(-1L)))
      .filter(col("best") > col("prevmax"))
      .join(perPrice, col("size") === col("p_sz") &&
        col("best") === col("cents"))
      .select(col("size"), round(col("best") / 100.0, 2)
        .as("retail_price"), col("n_parts"))
  }

  def monthOverMonth(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy("month")
    orders
      .groupBy(col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("__cents"))
      .withColumn("__prev", lag("__cents", 1).over(w))
      .select(col("o_orderpriority"), col("month"),
        round(col("__cents") / 100.0, 2).as("revenue"),
        round((col("__cents") - col("__prev")) / col("__prev").cast("double"),
          6).as("mom_growth"))
  }
}
