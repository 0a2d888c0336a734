package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand twins for the sixth round-10 wave (TWAP, Croston, Newey–West,
  * PK discovery). */
class Wave10fSpec extends SparkSpec {

  import spark.implicits._

  test("twap: holding-time weights beat the burst-biased plain mean " +
      "on a hand series") {
    // value 10 holds 3 s, 20 holds 1 s, last obs (99) drops
    val ev = Seq((1L, 0L, 10.0), (2L, 3L, 20.0), (3L, 4L, 99.0))
      .toDF("event_id", "s", "value")
      .select(col("event_id"), timestamp_seconds(col("s")).as("ts"),
        lit(1L).as("user_id"), lit("click").as("event_type"),
        col("value"))
    val r = Windows.twap(ev).collect().head
    assert(r.getAs[Long]("n_intervals") == 2)
    assert(r.getAs[Double]("twap") == 12.5)
    assert(r.getAs[Double]("plain_mean") == 15.0)
  }

  test("croston: replays the hand recurrence over gapped arrivals") {
    // purchases on days 0, 2, 3 with sizes 10, 20, 10
    val ev = Seq((1L, 0L, 10.0), (2L, 2 * 86400L, 20.0),
      (3L, 3 * 86400L, 10.0))
      .toDF("event_id", "s", "value")
      .select(col("event_id"), timestamp_seconds(col("s")).as("ts"),
        lit(1L).as("user_id"), lit("purchase").as("event_type"),
        col("value"))
    val out = Resample.croston(ev).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Double]("z"), r.getAs[Double]("p"),
          r.getAs[Double]("forecast"))).toMap
    // init: z=10, p=1; day2: z=10+.2*10=12, p=1+.2*(2-1)=1.2
    // day3: z=12+.2*(10-12)=11.6, p=1.2+.2*(1-1.2)=1.16
    assert(out(0L) == ((10.0, 1.0, 10.0)), s"$out")
    assert(out(2L)._1 == 12.0 && out(2L)._2 == 1.2, s"$out")
    assert(math.abs(out(2L)._3 - 10.0) < 1e-6)
    assert(math.abs(out(3L)._1 - 11.6) < 1e-9 &&
      math.abs(out(3L)._2 - 1.16) < 1e-9, s"$out")
  }

  test("neweyWest: matches a plain-Scala brute force on the real " +
      "series, and autocorrelated residuals inflate the HAC SE") {
    val ev = graft.Tables.events(spark, sf)
    val r = Stats.neweyWest(ev).collect().head
    // brute force twin from the same exact daily means
    def daily(t: String) = ev.filter(col("event_type") === t)
      .groupBy(expr("unix_date(cast(ts as date))").cast("long").as("d"))
      .agg((Exact.avgValueMicros.cast("double") / 1e6).as("v"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val (mx, my) = (daily("click"), daily("view"))
    val ds = mx.keySet.intersect(my.keySet).toSeq.sorted
    val (xs, ys) = (ds.map(mx), ds.map(my))
    val n = ds.size.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val b = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val a = (sy - b * sx) / n
    val xbar = sx / n
    val vq = xs.zip(ys).map { case (x, y) =>
      math.floor((x - xbar) * (y - a - b * x) * 1e3 + 0.5).toLong
    }
    def gamma(l: Int): Double =
      vq.dropRight(l).zip(vq.drop(l)).map { case (p, q) =>
        BigInt(p) * BigInt(q)
      }.sum.toDouble / 1e6
    val sHac = gamma(0) + (1 to 5).map(l =>
      2.0 * (1.0 - l / 6.0) * gamma(l)).sum
    val seExp = math.sqrt(sHac) / (sxx - sx * sx / n)
    assert(math.abs(r.getAs[Double]("slope") -
      math.floor(b * 1e6 + 0.5) / 1e6) < 1e-9 ||
      math.abs(r.getAs[Double]("slope") - b) < 1e-5)
    assert(math.abs(r.getAs[Double]("se_hac") - seExp) < 1e-4,
      s"${r.getAs[Double]("se_hac")} vs $seExp")
  }

  test("lorenzCurve: hand deciles — equal values give the diagonal, " +
      "one whale bends the curve; monotone and ends at 1") {
    def orders(vals: Seq[Double]) = vals.zipWithIndex.map {
      case (v, i) => (i.toLong, v)
    }.toDF("o_orderkey", "o_totalprice")
    val flat = Stats.lorenzCurve(orders(Seq.fill(20)(5.0))).collect()
    flat.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert(math.abs(r.getAs[Double]("cum_value_share") -
        (d + 1) / 10.0) < 1e-9, s"$r")
    }
    val whale = Stats.lorenzCurve(orders(Seq.fill(19)(1.0) :+ 81.0))
      .collect().map(r => r.getAs[Long]("decile") ->
        r.getAs[Double]("cum_value_share")).toMap
    // 19 at 1.0 + one 81.0: total 100; deciles 0..8 hold 2 small each,
    // decile 9 holds one small + the whale
    (0 to 8).foreach(d => assert(
      math.abs(whale(d.toLong) - (2.0 * (d + 1)) / 100.0) < 1e-9,
      s"$whale"))
    assert(whale(9L) == 1.0)
    val cums = (0 to 9).map(d => whale(d.toLong))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
  }

  test("pkDiscovery: a planted composite key is found; no single " +
      "column qualifies") {
    val orders = Seq(
      (1L, 10L, "O", "1996-01-01", "P1"),
      (1L, 20L, "O", "1996-01-01", "P1"),
      (2L, 10L, "F", "1996-01-02", "P2"),
      (2L, 20L, "F", "1996-01-02", "P2"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "d",
        "o_orderpriority")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        to_date(col("d")).as("o_orderdate"), col("o_orderpriority"))
    val out = Quality.pkDiscovery(orders).collect()
      .map(r => r.getAs[String]("columns") ->
        (r.getAs[Long]("ndv"), r.getAs[Boolean]("is_key"))).toMap
    assert(out.size == 15)
    assert(out("o_orderkey+o_custkey") == ((4L, true)), s"$out")
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
      "o_orderpriority").foreach(c => assert(!out(c)._2, s"$c: $out"))
    // and on the real table the true PK surfaces
    val real = Quality.pkDiscovery(graft.Tables.orders(spark, sf))
      .collect().map(r => r.getAs[String]("columns") ->
        r.getAs[Boolean]("is_key")).toMap
    assert(real("o_orderkey"), s"$real")
  }
}
