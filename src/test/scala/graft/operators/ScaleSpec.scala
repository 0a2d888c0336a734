package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  test("saltedJoin equals the plain join, with the salt column dropped") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val salted = Scale.saltedJoin(orders, customer, "o_custkey", "c_custkey", 8)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("AQE splits a skewed join partition at runtime (the no-salt path)") {
    import spark.implicits._
    // one pathological key carrying ~all rows; thresholds lowered so
    // the test-scale frame trips the same machinery a 100 TB skew does
    val confs = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(60000)
        .select((when(col("id") % 100 =!= 0, 0L).otherwise(col("id")))
          .as("k"), col("id").as("payload"))
      val dim = spark.range(60000).select(col("id").as("k"),
        (col("id") * 2).as("attr"))
      val j = fact.join(dim, Seq("k"))
        .groupBy(spark_partition_id().as("__p"))
        .agg(count(lit(1)).as("n"))
      val rows = j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE must mark the skewed join for runtime split:\n${p.take(4000)}")
      // the hot key's ~59k join rows really did land on MULTIPLE tasks
      val hotTasks = rows.count(_.getAs[Long]("n") > 1000L)
      assert(hotTasks > 1,
        s"skew split must spread the hot key across tasks, saw $hotTasks")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bandJoinFirstAgree: a capped first band can't drop a pair a later band holds") {
    import spark.implicits._
    // 7 docs, 2 bands. Band 0: ALL docs share key 100 (bucket of 7 —
    // over a cap of 5). Band 1: docs 6,7 share key 99 (bucket of 2 —
    // under cap), everyone else is alone. The (6,7) pair's FIRST
    // agreeing band is over-cap; only the carried over-flags let band 1
    // rescue it (the round-2 first-agreeing-band predicate lost it).
    val base = (1L to 7L).map { d =>
      (d, Seq(100L, if (d >= 6L) 99L else d))
    }.toDF("doc_id", "bks")
    val capped = Scale.capBuckets(base, "doc_id", cap = 5)
    val pairs = Scale.bandJoinFirstAgree(capped, "doc_id")
      .select(col("x.doc_id"), col("y.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((6L, 7L)),
      s"expected only the band-1 rescue pair, got ${pairs.mkString(",")}")
  }

  test("bucketed tables join without any exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // a fresh in-memory catalog doesn't know stale warehouse dirs from
      // previous JVMs — drop both catalog entries and locations
      Seq("b_orders", "b_lineitem").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(s"spark-warehouse/$t")
        if (loc.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(loc)
        }
      }
      Scale.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 4)
      Scale.writeBucketed(
        Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 4)
      val joined = Scale.readTable(spark, "b_orders")
        .join(Scale.readTable(spark, "b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
