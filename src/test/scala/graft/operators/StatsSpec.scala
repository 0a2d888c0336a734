package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {

  import spark.implicits._

  test("welchTTest matches the closed-form statistic on a known sample") {
    // A = [1,2,3,4]            n=4, mean=2.5, var=5/3
    // B = [2,4,6,8,10]         n=5, mean=6,   var=10
    // t = -3.5/sqrt(5/12 + 2) = -2.2514, Welch df = 5.5208
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("A", _)) ++
      Seq(2.0, 4.0, 6.0, 8.0, 10.0).map(("B", _))).toDF("g", "v")
    val row = Stats.welchTTest(df, "g", "v").collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getAs[String]("group_a") == "A" && r.getAs[String]("group_b") == "B")
    assert(r.getAs[Long]("na") == 4L && r.getAs[Long]("nb") == 5L)
    assert(math.abs(r.getAs[Double]("t_stat") - -2.2514) < 1e-4)
    assert(math.abs(r.getAs[Double]("df") - 5.5208) < 1e-4)
  }

  test("welchTTest emits each unordered group pair once, identical groups score t=0") {
    val df = (Seq.tabulate(20)(i => ("x", i.toDouble)) ++
      Seq.tabulate(20)(i => ("y", i.toDouble)) ++
      Seq.tabulate(20)(i => ("z", i * 2.0))).toDF("g", "v")
    val rows = Stats.welchTTest(df, "g", "v").collect()
    val pairs = rows.map(r =>
      (r.getAs[String]("group_a"), r.getAs[String]("group_b"))).toSet
    assert(pairs == Set(("x", "y"), ("x", "z"), ("y", "z")))
    val xy = rows.find(r => r.getAs[String]("group_a") == "x" &&
      r.getAs[String]("group_b") == "y").get
    assert(xy.getAs[Double]("t_stat") == 0.0,
      "identical distributions must score exactly t=0")
  }

  test("anovaF matches the closed-form F on a known sample") {
    // A=[1,2,3,4] B=[2,4,6,8,10] C=[5,5,5]: N=12, k=3, F=2.7917
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("A", _)) ++
      Seq(2.0, 4.0, 6.0, 8.0, 10.0).map(("B", _)) ++
      Seq(5.0, 5.0, 5.0).map(("C", _))).toDF("g", "v")
    val r = Stats.anovaF(df, "g", "v").collect().head
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n_total") == 12L)
    assert(r.getAs[Long]("df1") == 2L && r.getAs[Long]("df2") == 9L)
    assert(math.abs(r.getAs[Double]("f_stat") - 2.7917) < 1e-4)
  }
}
