package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-case specs for the TPC-H composites whose semantics have sharp
  * edges the sf-oracle could mask: Q15's max-tie retention and Q19's
  * bracket membership under the hand-decomposed OR pushdown.
  */
class TpchSpec extends SparkSpec {

  import spark.implicits._

  test("q15 keeps ALL suppliers tied at the maximum revenue") {
    val li = Seq(
      (1L, 100.0, 0.0, "1996-02-01"), // supp 1: 100.00
      (2L, 50.0, 0.0, "1996-02-01"),  // supp 2: 50 + 50 = 100.00 (tie)
      (2L, 50.0, 0.0, "1996-03-01"),
      (3L, 99.0, 0.0, "1996-02-01"),  // supp 3: 99 — loses
      (1L, 900.0, 0.0, "1995-01-01")  // outside the quarter — ignored
    ).toDF("l_suppkey", "l_extendedprice", "l_discount", "d")
      .withColumn("l_shipdate", col("d").cast("timestamp"))
    val sup = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    val r = Tpch.q15(sup, li).collect()
    assert(r.map(_.getAs[Long]("s_suppkey")).toSeq == Seq(1L, 2L),
      "both tied suppliers must survive, in key order")
    assert(r.forall(_.getAs[Double]("total_revenue") == 100.0))
  }

  test("q19 admits exactly the bracket-matching lines") {
    val part = Seq(
      (1L, "Brand#12", 3),  // bracket 1 when qty in [1,11]
      (2L, "Brand#23", 8),  // bracket 2 when qty in [10,20]
      (3L, "Brand#34", 20)  // size out of every bracket
    ).toDF("p_partkey", "p_brand", "p_size")
    val li = Seq(
      (1L, 5.0, 10.0, 0.0),  // in (bracket 1) → 10.00
      (1L, 20.0, 99.0, 0.0), // qty outside bracket 1 → out
      (2L, 15.0, 20.0, 0.5), // in (bracket 2) → 10.00
      (3L, 25.0, 99.0, 0.0)  // part size disqualifies → out
    ).toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val r = Tpch.q19(li, part).collect().head
    assert(r.getAs[Long]("n_lines") == 2L)
    assert(r.getAs[Double]("revenue") == 20.0)
  }

  test("q13 keeps zero-order customers in the k = 0 bucket") {
    val cust = Seq(1L, 2L, 3L).toDF("c_custkey")
    val ord = Seq(
      (10L, 1L, "1-URGENT"), // counts for cust 1
      (11L, 1L, "5-LOW"),    // excluded by the ON predicate
      (12L, 2L, "5-LOW")     // cust 2's ONLY order is excluded → k = 0
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val r = Tpch.q13(cust, ord).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // custs 2 and 3 both land in the zero bucket; cust 1 in the 1 bucket
    assert(r == Map(0L -> 2L, 1L -> 1L))
  }

  test("q21 blames only the sole returning supplier on shared orders") {
    val sup = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    val ord = Seq((100L, "F"), (200L, "F"), (300L, "O"))
      .toDF("o_orderkey", "o_orderstatus")
    val li = Seq(
      (100L, 1L, "R"), (100L, 2L, "N"), // order 100: only s1 returned → blamed
      (200L, 1L, "R"), (200L, 2L, "R"), // order 200: both returned → neither
      (300L, 3L, "R"), (300L, 1L, "N")  // order 300 not finished → ignored
    ).toDF("l_orderkey", "l_suppkey", "l_returnflag")
    val r = Tpch.q21(sup, ord, li).collect()
      .map(x => x.getString(0) -> x.getLong(1))
    assert(r.toSeq == Seq("s1" -> 1L))
  }

  test("q22 applies the positive-balance threshold and the anti-join") {
    val cust = Seq(
      (1L, 0, 100.0),  // above avg(60) but has an urgent order → out
      (2L, 0, 80.0),   // above avg, no urgent order → in
      (3L, 1, -50.0),  // negative: excluded from the avg AND below it
      (4L, 1, 20.0)    // below avg → out
    ).toDF("c_custkey", "c_nationkey", "c_acctbal")
    // avg over positive balances = (100 + 80 + 20) / 3 = 66.67
    val ord = Seq((10L, 1L, "1-URGENT"), (11L, 2L, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val r = Tpch.q22(cust, ord).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getDouble(2)))
    assert(r.toSeq == Seq((0, 1L, 80.0)))
  }
}
