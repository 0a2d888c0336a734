package graft.plans

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("native functions are SQL-callable after registration") {
    GraftFunctions.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(2.0D, 1.0D)) AS d")
      .first().getDouble(0)
    assert(dot == 4.0)
    val sim = spark.sql(
      "SELECT graft_simhash(array('a','b')) AS s, graft_simhash(array('a','b')) AS t")
      .first()
    assert(sim.getLong(0) == sim.getLong(1))
    val mh = spark.sql(
      "SELECT size(graft_minhash(array('a','b','c'), 16)) AS k").first().getInt(0)
    assert(mh == 16)
  }

  test("registration is idempotent") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_dot(array(1.0D), array(3.0D))")
      .first().getDouble(0) == 3.0)
  }

  test("approx distinct stays within HLL error bounds") {
    import graft.{Tables}
    import graft.operators.Stats
    Stats.approxDistinct(Tables.lineitem(spark, sf), "l_returnflag", "l_partkey")
      .collect().foreach { r =>
        val approx = r.getAs[Long]("approx_distinct").toDouble
        val exact = r.getAs[Long]("exact_distinct").toDouble
        assert(math.abs(approx - exact) / exact < 0.15,
          s"approx $approx vs exact $exact")
      }
  }
}
