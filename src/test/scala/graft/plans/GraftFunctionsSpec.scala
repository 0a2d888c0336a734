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

  test("approx quantiles stay within rank-error bounds of exact percentiles") {
    import graft.Tables
    import graft.operators.Stats
    val li = Tables.lineitem(spark, sf)
    val qs = Seq(0.25, 0.5, 0.75)
    val approx = Stats.approxQuantilesDf(li, "l_extendedprice", qs).first()
    val exact = Stats.quantiles(li, "l_extendedprice", qs).first()
    // accuracy=10000 → rank error ≤ 1e-4; translate to a value tolerance by
    // bracketing: the approx q-quantile must lie between the exact
    // (q-eps) and (q+eps) quantiles with eps well above the bound
    val eps = 0.01
    val lo = Stats.quantiles(li, "l_extendedprice", qs.map(q => (q - eps).max(0.0))).first()
    val hi = Stats.quantiles(li, "l_extendedprice", qs.map(q => (q + eps).min(1.0))).first()
    qs.indices.foreach { i =>
      val a = approx.getDouble(i)
      assert(a >= lo.getDouble(i) && a <= hi.getDouble(i),
        s"q=${qs(i)}: approx $a outside [${lo.getDouble(i)}, ${hi.getDouble(i)}] (exact ${exact.getDouble(i)})")
    }
    // the graft_shingle_hashes SQL surface rides along here: registered,
    // deterministic, distinct, sorted
    GraftFunctions.register(spark)
    val sh = spark.sql(
      "SELECT graft_shingle_hashes('a b c d a b c', 3) AS h").first().getSeq[Long](0)
    assert(sh.length == 4 && sh == sh.sorted && sh.distinct == sh)
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
