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

  test("lapsedCustomers: ordered-ever AND not-ordered-in-window, exactly") {
    import spark.implicits._
    val cust = Seq((1L, "alice", "A"), (2L, "bob", "B"), (3L, "carol", "C"))
      .toDF("c_custkey", "c_name", "c_mktsegment")
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (10L, 1L, d("1995-06-01")), // alice: before the window only -> lapsed
      (11L, 2L, d("1996-06-01")), // bob: inside the window -> active
      (12L, 2L, d("1995-06-01"))
      // carol: never ordered -> excluded by EXISTS
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val got = Relational.lapsedCustomers(cust, orders,
      "1996-01-01", "1997-01-01").collect().map(_.getAs[Long]("c_custkey"))
    assert(got.toSeq == Seq(1L))
  }

  test("nullSafeCategorize matches NULL keys to the NULL dimension row") {
    import spark.implicits._
    val facts = Seq((1L, Some("a")), (2L, None), (3L, Some("b")),
      (4L, None)).toDF("event_id", "k")
    val dim = Seq((Some("a"), "a"), (Some("b"), "b"),
      (None, "__uncategorized__")).toDF("dk", "label")
    val got = Relational.nullSafeCategorize(facts, dim, "k", "dk", "label")
      .collect().map(r => r.getAs[String]("label") -> r.getAs[Long]("n")).toMap
    assert(got == Map("a" -> 1L, "b" -> 1L, "__uncategorized__" -> 2L),
      "every NULL fact must land in the NULL bucket, none dropped")
  }

  test("positionalTokens pairs each token with its 0-based position") {
    import spark.implicits._
    val docs = Seq((0L, "a b c"), (1L, "skip me"), (100L, "x y"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.positionalTokens(docs, every = 100L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"),
        r.getAs[String]("token"))).toSet
    assert(got == Set((0L, 0, "a"), (0L, 1, "b"), (0L, 2, "c"),
      (100L, 0, "x"), (100L, 1, "y")))
  }

  test("monthOverMonth: +50% growth by hand, first month null") {
    import spark.implicits._
    val orders = Seq(
      ("1-URGENT", "2024-01-05", 60.0), ("1-URGENT", "2024-01-20", 40.0),
      ("1-URGENT", "2024-02-11", 150.0)
    ).toDF("o_orderpriority", "d", "o_totalprice")
      .withColumn("o_orderdate", org.apache.spark.sql.functions.col("d").cast("timestamp"))
    val rows = Relational.monthOverMonth(orders).collect()
      .sortBy(_.getAs[java.sql.Date]("month").toString)
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("revenue") == 100.0 &&
      rows(0).isNullAt(rows(0).fieldIndex("mom_growth")),
      "first month has no prior period — growth must be null")
    assert(rows(1).getAs[Double]("revenue") == 150.0 &&
      rows(1).getAs[Double]("mom_growth") == 0.5)
  }

  test("unpivot round-trips the pivot back to the long rollup exactly") {
    val events = graft.Tables.events(spark, sf)
    val melted = Relational.unpivotEventCounts(events).collect()
      .map(r => (r.getAs[Int]("day"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("n")).toMap
    val long = events
      .withColumn("day", dayofmonth(col("ts")))
      .groupBy("day", "event_type").count().collect()
      .map(r => (r.getAs[Int]("day"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("count")).toMap
    assert(melted == long, "melt(pivot(x)) must equal the long-form rollup")
  }

  test("nextTokenTable: hand-computed successors, rank order, probability mass") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a c"), (2L, "b a")).toDF("doc_id", "text")
    // contexts: a→{b:2, c:1}, b→{a:3}
    val out = TextAnalysis.nextTokenTable(docs, k = 2, minCount = 1)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[Int]("rank")) ->
        (r.getAs[String]("w2"), r.getAs[Long]("n"), r.getAs[Double]("p")))
      .toMap
    assert(out(("a", 1)) == ("b", 2L, 0.666667))
    assert(out(("a", 2)) == ("c", 1L, 0.333333))
    assert(out(("b", 1)) == ("a", 3L, 1.0))
    assert(out.size == 3)
  }

  test("divisionActiveEveryMonth keeps only all-month customers, divisor derives") {
    import spark.implicits._
    def orders(rows: Seq[(Long, String)]) =
      rows.toDF("o_custkey", "d")
        .select(col("o_custkey"), to_timestamp(col("d")).as("o_orderdate"))
    val full = orders(Seq(
      (1L, "1996-01-05"), (1L, "1996-02-05"), (1L, "1996-03-05"),
      (2L, "1996-01-10"), (2L, "1996-02-10"), // missing March → out
      (3L, "1996-01-01"), (3L, "1996-01-20"), (3L, "1996-02-02"),
      (3L, "1996-03-30")))
    val out = Relational.divisionActiveEveryMonth(full).collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        (r.getAs[Long]("months_active"), r.getAs[Long]("n_orders"))).toMap
    assert(out.keySet == Set(1L, 3L))
    assert(out(3L) == (3L, 4L), "duplicate-month orders count, months dedup")
    // divisor is DERIVED: if no order anywhere touches March, a
    // two-month customer divides evenly — the quantifier adapts to the
    // months actually present, it is not a hard-coded 3
    val noMarch = orders(Seq(
      (1L, "1996-01-05"), (1L, "1996-02-05"),
      (2L, "1996-01-10"), (2L, "1996-02-10")))
    assert(Relational.divisionActiveEveryMonth(noMarch).count() == 2)
  }

  test("associationRules: hand-checked support/confidence/lift and tie order") {
    import spark.implicits._
    // o1{1,2,3} o2{1,2} o3{1,3} o4{2,3} o5{1,2}: N=5, n(1)=4 n(2)=4 n(3)=3
    // pair(1,2)=3 → lift 3·5/16 = 0.9375; (1,3)=(2,3)=2 → lift 10/12 each
    val li = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 2L), (4L, 3L), (5L, 1L), (5L, 2L))
      .toDF("l_orderkey", "l_partkey")
    val out = Relational.associationRules(li).collect()
      .map(r => (r.getAs[Long]("i1"), r.getAs[Long]("i2")) ->
        (r.getAs[Long]("n_pair"), r.getAs[Double]("confidence"),
          r.getAs[Double]("lift"))).toMap
    assert(out.size == 3)
    assert(out((1L, 2L)) == (3L, 0.75, 0.9375))
    assert(out((1L, 3L)) == (2L, 0.5, 0.833333))
    assert(out((2L, 3L)) == (2L, 0.5, 0.833333))
    // topK cut respects the lift-then-key order: equal-lift pairs break
    // ties on (i1, i2), so k=2 keeps (1,2) then (1,3), never (2,3)
    val top2 = Relational.associationRules(li, topK = 2).collect()
      .map(r => (r.getAs[Long]("i1"), r.getAs[Long]("i2"))).toSeq
    assert(top2 == Seq((1L, 2L), (1L, 3L)))
  }

  test("skylineParts: only non-dominated (size, price) points survive " +
      "the cumulative-max scan; duplicates at a frontier point count") {
    import spark.implicits._
    def parts(rows: (Int, Double)*) = rows.toSeq.zipWithIndex
      .map { case ((sz, p), i) => (i.toLong, sz, p) }
      .toDF("p_partkey", "p_size", "p_retailprice")
    // (1, 50) and (3, 80): frontier. (3, 40) dominated by (1,50);
    // (5, 80) dominated by (3,80) (same price, bigger size);
    // (2, 50) dominated by (1,50) on size with equal price
    val out = Relational.skylineParts(parts((1, 50.0), (3, 80.0),
      (3, 40.0), (5, 80.0), (2, 50.0))).collect()
      .map(r => (r.getAs[Long]("size"),
        (r.getAs[Double]("retail_price"), r.getAs[Long]("n_parts"))))
      .toMap
    assert(out == Map(1L -> (50.0, 1L), 3L -> (80.0, 1L)), s"$out")
    // two copies of a frontier point both survive (neither strictly
    // dominates the other)
    val dup = Relational.skylineParts(parts((1, 50.0), (1, 50.0),
      (4, 90.0))).collect()
      .map(r => (r.getAs[Long]("size"), r.getAs[Long]("n_parts"))).toMap
    assert(dup == Map(1L -> 2L, 4L -> 1L), s"$dup")
  }

  test("rollupGroupingId: gid separates subtotal NULLs from data, " +
      "first grouping column owns the high bit") {
    import spark.implicits._
    val li = Seq(("A", "F", 1.0), ("A", "O", 2.0), ("B", "F", 4.0))
      .toDF("l_returnflag", "l_linestatus", "l_extendedprice")
    val out = Relational.rollupGroupingId(li).collect()
      .map(r => ((Option(r.getAs[String]("flag")),
        Option(r.getAs[String]("status"))),
        (r.getAs[Long]("gid"), r.getAs[String]("level"),
          r.getAs[Double]("revenue")))).toMap
    assert(out((Some("A"), Some("F"))) == (0L, "cell", 1.0), s"$out")
    assert(out((Some("A"), None)) == (1L, "flag_total", 3.0), s"$out")
    assert(out((Some("B"), None)) == (1L, "flag_total", 4.0), s"$out")
    assert(out((None, None)) == (3L, "grand_total", 7.0), s"$out")
    assert(out.size == 6, s"$out")
  }

  test("hierarchyFlatten: a planted div-10 chain settles at exact " +
      "depths in log rounds; roots self-report depth 0") {
    import spark.implicits._
    // chain 12345 -> 1234 -> 123 -> 12 -> 1 (root), plus root 2:
    // depth histogram {0: 2 nodes/2 roots, 1..4: 1 node under root 1}
    val c = Seq(1L, 2L, 12L, 123L, 1234L, 12345L).toDF("c_custkey")
    val out = Relational.hierarchyFlatten(c).collect()
      .map(r => (r.getAs[Long]("depth"),
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_roots")))).toMap
    assert(out == Map(0L -> (2L, 2L), 1L -> (1L, 1L), 2L -> (1L, 1L),
      3L -> (1L, 1L), 4L -> (1L, 1L)), s"$out")
  }

  test("mapAggRevenue: map entries survive the construct/explode " +
      "round trip with per-flag status cardinality") {
    import spark.implicits._
    val li = Seq(("A", "F", 1.0), ("A", "F", 2.0), ("A", "O", 3.0),
      ("B", "F", 4.0))
      .toDF("l_returnflag", "l_linestatus", "l_extendedprice")
    val out = Relational.mapAggRevenue(li).collect()
      .map(r => ((r.getAs[String]("flag"), r.getAs[String]("status")),
        (r.getAs[Long]("n_statuses"), r.getAs[Double]("revenue"))))
      .toMap
    assert(out == Map(("A", "F") -> (2L, 3.0), ("A", "O") -> (2L, 3.0),
      ("B", "F") -> (1L, 4.0)), s"$out")
  }

  test("arrayHofOrderStats: lambda aggregate/filter/element_at agree " +
      "with the hand-computed order profile") {
    import spark.implicits._
    val li = Seq((1L, 500.0), (1L, 1500.0), (1L, 2000.0), (2L, 10.0))
      .toDF("l_orderkey", "l_extendedprice")
    val out = Relational.arrayHofOrderStats(li).collect()
      .map(r => (r.getAs[Long]("orderkey"), r)).toMap
    val o1 = out(1L)
    assert(o1.getAs[Long]("n_lines") == 3L, s"$o1")
    assert(o1.getAs[Long]("total_cents") == 400000L, s"$o1")
    assert(o1.getAs[Long]("n_expensive") == 2L, s"$o1")
    assert(o1.getAs[Long]("max_cents") == 200000L, s"$o1")
    assert(o1.getAs[Long]("span_cents") == 150000L, s"$o1")
    val o2 = out(2L)
    assert(o2.getAs[Long]("n_expensive") == 0L &&
      o2.getAs[Long]("span_cents") == 0L, s"$o2")
  }
}
