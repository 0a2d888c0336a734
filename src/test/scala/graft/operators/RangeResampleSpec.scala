package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RangeResampleSpec extends SparkSpec {

  test("binned range join equals the naive range join and stays an equi-join") {
    val base = 1704067200000000L
    val intervals = Tables.nation(spark, sf).select(col("n_nationkey"),
      (lit(base) + col("n_nationkey") * 100800000000L).as("s_us"),
      (lit(base) + col("n_nationkey") * 100800000000L + 28800000000L).as("e_us"))
    val points = Tables.events(spark, sf).select(unix_micros(col("ts")).as("p_us"))
    val binned = RangeJoin.pointInInterval(points, intervals,
      "p_us", "s_us", "e_us", 28800000000L)
    val naive = points.join(intervals,
      col("p_us") >= col("s_us") && col("p_us") <= col("e_us"))
    assert(binned.count() == naive.count())
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"binned range join must be an equi-join:\n$plan")
  }

  test("resample emits a dense series with correct forward fill") {
    val out = Resample.resampleWithGapFill(Tables.events(spark, sf), 3600000000L)
    val perUser = out.groupBy("user_id")
      .agg(count(lit(1)).as("slots"),
        ((max("slot_us") - min("slot_us")) / 3600000000L + 1).as("expected"))
      .filter(col("slots") =!= col("expected"))
    assert(perUser.count() == 0, "series must be dense per user")
    // filled rows carry the previous observed mean, never null after first slot
    assert(out.filter(col("avg_value_e4").isNull).count() == 0)
    val observed = out.filter(!col("filled"))
    assert(observed.count() ==
      Resample.downsample(Tables.events(spark, sf), 3600000000L).count())
  }
}
