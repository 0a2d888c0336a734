package graft.plans

import graft.{SparkSpec, Tables}
import graft.operators.AsOfJoin
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Locks the native AsOfJoinExec (custom LogicalPlan + Strategy +
  * SparkPlan) to the union+window composition it replaces. */
class NativeAsOfJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  import spark.implicits._

  private def mkRight = Seq(
    (1L, "2024-01-01 00:00:00", "r0"),
    (1L, "2024-01-01 01:00:00", "r1"),
    (2L, "2024-01-01 02:00:00", "r2"))
    .toDF("k", "s", "payload")
    .select(col("k"), to_timestamp(col("s")).as("ts"), col("payload"))

  private def mkLeft = Seq(
    (1L, "2024-01-01 00:30:00"), // → r0
    (1L, "2024-01-01 01:00:00"), // tie at equal ts → r1
    (2L, "2024-01-01 01:59:59"), // nothing at-or-before → null
    (3L, "2024-01-01 05:00:00")) // no key match → null
    .toDF("k", "s")
    .select(col("k"), to_timestamp(col("s")).as("ts"))

  test("native asof matches latest-at-or-before semantics incl. ties and misses") {
    val out = AsOfJoin.asofNative(mkLeft, mkRight, "k", "ts")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getString(2)))
      .toSet
    assert(out == Set(
      (1L, "2024-01-01 00:30:00.0", "r0"),
      (1L, "2024-01-01 01:00:00.0", "r1"),
      (2L, "2024-01-01 01:59:59.0", null),
      (3L, "2024-01-01 05:00:00.0", null)))
  }

  test("native asof equals the window composition on the events table") {
    val events = Tables.events(spark, sf)
    val native = AsOfJoin.clickAttributionNative(events).collect().toSet
    val composed = AsOfJoin.clickAttribution(events).collect().toSet
    assert(native.nonEmpty && native == composed)
  }

  test("left rows with an empty right side survive with null payload") {
    val emptyRight = mkRight.filter(col("k") === 999L)
    val out = AsOfJoin.asofNative(mkLeft, emptyRight, "k", "ts")
    assert(out.count() == 4)
    assert(out.filter(col("payload").isNotNull).count() == 0)
  }

  test("many right rows per key keep only the latest at-or-before") {
    // 100 right updates per key, left probes between updates — exercises
    // candidate replacement along a long right run within one key group.
    val right = (0 until 100).flatMap(i => Seq((1L, i.toLong * 10, s"v$i"), (2L, i.toLong * 10 + 5, s"w$i")))
      .toDF("k", "us", "payload")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("payload"))
    val left = Seq((1L, 777L), (1L, 333L), (2L, 338L), (2L, 4L))
      .toDF("k", "us")
      .select(col("k"), timestamp_micros(col("us")).as("ts"))
    val nat = AsOfJoin.asofNative(left, right, "k", "ts")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(nat == Set((1L, "v77"), (1L, "v33"), (2L, "w33"), (2L, null)))
  }

  test("plan uses AsOfJoinExec with one exchange and one sort per side") {
    val out = AsOfJoin.asofNative(mkLeft, mkRight, "k", "ts")
    out.collect() // finalize AQE
    val plan = out.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case e: AsOfJoinExec => e }.size == 1, plan.toString)
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(exchanges.size == 2, s"want one shuffle per side:\n$plan")
    val sorts = collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.size == 2, s"want one sort per side:\n$plan")
  }
}
