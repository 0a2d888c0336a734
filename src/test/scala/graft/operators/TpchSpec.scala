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
}
