package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  test("asof picks the latest right row at or before the left timestamp") {
    val right = Seq(
      (1L, "2024-01-01 00:00:00", "r0"),
      (1L, "2024-01-01 01:00:00", "r1"),
      (2L, "2024-01-01 02:00:00", "r2"))
      .toDF("k", "s", "payload")
      .select(col("k"), to_timestamp(col("s")).as("ts"), col("payload"))
    val left = Seq(
      (1L, "2024-01-01 00:30:00"), // → r0
      (1L, "2024-01-01 01:00:00"), // tie → r1
      (2L, "2024-01-01 01:59:59"), // nothing before → null
      (3L, "2024-01-01 05:00:00")) // no key match → null
      .toDF("k", "s")
      .select(col("k"), to_timestamp(col("s")).as("ts"))
    val out = AsOfJoin.asof(left, right, "k", "ts")
      .select(col("k"), col("ts"), col("matched.payload").as("p"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getString(2)))
      .toSet
    assert(out == Set(
      (1L, "2024-01-01 00:30:00.0", "r0"),
      (1L, "2024-01-01 01:00:00.0", "r1"),
      (2L, "2024-01-01 01:59:59.0", null),
      (3L, "2024-01-01 05:00:00.0", null)))
  }

  test("attribution never matches a future click (point-in-time safety)") {
    val out = AsOfJoin.clickAttribution(Tables.events(spark, sf))
    val events = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pUs = r.getAs[Long]("p_ts_us")
      val cUs = events(r.getAs[Long]("c_event_id"))
      assert(cUs <= pUs, s"future leak: click at $cUs after purchase $pUs")
    }
  }

  test("asof runs in a single exchange on the key") {
    val df = AsOfJoin.clickAttribution(Tables.events(spark, sf))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1,
      s"expected one exchange:\n$plan")
  }
}
