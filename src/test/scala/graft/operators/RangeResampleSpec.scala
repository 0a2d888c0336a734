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

  test("interval overlap join equals the naive overlap join, once per pair, equi-shaped") {
    import spark.implicits._
    val ev = Tables.events(spark, sf).filter(col("user_id") < 30)
    val win = 600L * 1000000L
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), unix_micros(col("ts")).as("s1"),
        (unix_micros(col("ts")) + win).as("e1"))
    val purs = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pur_id"), unix_micros(col("ts")).as("s2"),
        (unix_micros(col("ts")) + win).as("e2"))
    val binned = RangeJoin.intervalOverlap(errs, purs,
      "s1", "e1", "s2", "e2", win)
    val naive = errs.join(purs, col("s1") <= col("e2") && col("s2") <= col("e1"))
    // exactly the naive pair set — multi-bin matches dedup to one row
    assert(binned.select("err_id", "pur_id").exceptAll(
      naive.select("err_id", "pur_id")).isEmpty)
    assert(binned.count() == naive.count())
    assert(binned.select("err_id", "pur_id").distinct().count() == binned.count())
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval overlap join must stay equi-join shaped:\n$plan")
    // intervals spanning MANY bins still dedup: shrink the bin far below
    // the window length
    val fine = RangeJoin.intervalOverlap(errs, purs,
      "s1", "e1", "s2", "e2", win / 7)
    assert(fine.count() == naive.count())
  }

  test("modePerGroup breaks frequency ties toward the smallest value") {
    import spark.implicits._
    val df = Seq(("g", 5.0), ("g", 5.0), ("g", 2.0), ("g", 2.0), ("g", 9.0))
      .toDF("k", "v")
    val m = Stats.modePerGroup(df, "k", "v").collect()
    assert(m.length == 1)
    assert(m.head.getAs[Double]("mode_value") == 2.0) // tie 2.0/5.0 → smaller
    assert(m.head.getAs[Long]("freq") == 2L)
  }

  test("interpolation fills gaps linearly and keeps observed slots exact") {
    import spark.implicits._
    val hour = 3600000000L
    // user 1: observed at slots 0 and 3 (values 1.0 → 4.0), gap at 1, 2
    val events = Seq(
      (1L, 0L * hour, 1.0),
      (1L, 3L * hour, 4.0),
      (2L, 0L * hour, 2.5)
    ).toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
    val out = Resample.resampleWithInterpolation(events, hour)
      .orderBy("user_id", "slot_us").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getAs[Long]("value_e4")).toSeq ==
      Seq(10000L, 20000L, 30000L, 40000L))
    assert(u1.map(_.getAs[Boolean]("filled")).toSeq ==
      Seq(false, true, true, false))
    // single-observation user: one slot, no gap rows
    assert(out.count(_.getLong(0) == 2L) == 1)
  }

  test("piecewiseTrend: flat-then-ramp recovers both slopes exactly at the knot") {
    import spark.implicits._
    // 20 flat hours at 10, then a unit ramp 30..49 — the CUSUM knot
    // lands on the step and each side's OLS is exact
    val events = (0 until 40).map { h =>
      (1L, h * 3600L, "click",
        if (h < 20) 10.0 else 30.0 + (h - 20))
    }.toDF("user_id", "s", "event_type", "value")
      .select(col("user_id"), timestamp_seconds(col("s")).as("ts"),
        col("event_type"), col("value"))
    val out = Resample.piecewiseTrend(events).orderBy("segment")
      .collect()
      .map(r => (r.getAs[Long]("segment"), r.getAs[Long]("n_hours"),
        r.getAs[Double]("slope_per_hour"), r.getAs[Double]("fit_start"),
        r.getAs[Double]("fit_end")))
    assert(out.toSeq == Seq(
      (1L, 20L, 0.0, 10.0, 10.0),
      (2L, 20L, 1.0, 30.0, 49.0)), s"${out.toSeq}")
  }

  test("bollingerBands: flat series never breaches; a spike breaches its own hour") {
    import spark.implicits._
    def ev(vs: Seq[Double]) = vs.zipWithIndex.map { case (v, h) =>
      (1L, h * 3600L, "click", v)
    }.toDF("user_id", "s", "event_type", "value")
      .select(col("user_id"), timestamp_seconds(col("s")).as("ts"),
        col("event_type"), col("value"))
    val flat = Resample.bollingerBands(ev(Seq.fill(40)(10.0))).collect()
    // full windows only: 40 hours → 17 rows; σ=0 → bands pin to mean
    assert(flat.length == 17)
    assert(flat.forall(r => !r.getAs[Boolean]("breach") &&
      r.getAs[Double]("lower") == 10.0 &&
      r.getAs[Double]("upper") == 10.0))
    // 30 flat hours then one 100-spike: only the spike hour breaches
    val spiked = Resample.bollingerBands(
      ev(Seq.fill(30)(10.0) ++ Seq(100.0))).collect()
      .map(r => r.getAs[Long]("hr") -> r.getAs[Boolean]("breach")).toMap
    assert(spiked(30L), "the spike hour must breach its own window")
    assert(spiked.filterKeys(_ < 30L).values.forall(!_))
  }

  test("sesGrid: a steep trend picks high alpha, an alternating series picks low") {
    import spark.implicits._
    def ev(f: Int => Double) = (0 until 60).map { h =>
      (1L, h * 3600L, "click", f(h))
    }.toDF("user_id", "s", "event_type", "value")
      .select(col("user_id"), timestamp_seconds(col("s")).as("ts"),
        col("event_type"), col("value"))
    def best(df: org.apache.spark.sql.DataFrame) = {
      val rows = Resample.sesGrid(df).collect()
      assert(rows.length == 9 &&
        rows.count(_.getAs[Boolean]("is_best")) == 1)
      rows.find(_.getAs[Boolean]("is_best")).get.getAs[Double]("alpha")
    }
    // steep trend: lag hurts, the most reactive alpha wins
    assert(best(ev(h => 10.0 * h)) == 0.9)
    // mean-reverting alternation: chasing noise hurts, smoothest wins
    assert(best(ev(h => 10.0 + (if (h % 2 == 0) 1.0 else -1.0))) == 0.1)
  }

  test("garchVariance: calm series decays h to the 1/(1-a-b) fixed point; shocks spike it") {
    import spark.implicits._
    def series(vs: Seq[Double]) = vs.zipWithIndex
      .map { case (v, i) => (1L, (i + 1) * 1000L, v) }
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("value"))
    // constant series: every innovation 0, h_t = 1 + 0.8·h_{t-1}
    // falls monotonically from the seed 10 toward the fixed point 5
    val calm = Resample.garchVariance(series(Seq.fill(40)(7.0)),
      1.0, 0.1, 0.8).orderBy("ts_us").collect()
    assert(calm.forall(_.getAs[Double]("innovation") == 0.0))
    val hs = calm.map(_.getAs[Double]("cond_var"))
    assert(hs.head == 10.0)
    assert(hs.zip(hs.tail).forall { case (a, b) => b < a })
    assert(math.abs(hs.last - 5.0) < 0.01)
    // a single shock: the NEXT step's variance jumps above the calm path
    val shocked = Resample.garchVariance(
      series(Seq.fill(20)(7.0) ++ Seq(27.0) ++ Seq.fill(5)(27.0)),
      1.0, 0.1, 0.8).orderBy("ts_us").collect()
      .map(_.getAs[Double]("cond_var"))
    assert(shocked(21) > shocked(20) + 30,
      s"a 20-unit shock adds 0.1*400 = 40 to the next h: ${shocked(21)}")
  }

  test("kalmanLevel: constant series holds level, gain decays to steady state") {
    import spark.implicits._
    val events = (1 to 60).map(i => (1L, i * 1000L, 42.0))
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("value"))
    val out = Resample.kalmanLevel(events, q = 0.5, r = 2.0)
      .orderBy("ts_us").collect()
      .map(r => (r.getAs[Double]("level"), r.getAs[Double]("gain")))
    // a constant series never moves the level, whatever the gain
    assert(out.forall(_._1 == 42.0))
    // first observation is trusted fully; gains then fall monotonically
    // to the steady state K* = (P*+q)/(P*+q+r), P* = (−q+√(q²+4qr))/2
    assert(out.head._2 == 1.0)
    val gains = out.map(_._2)
    assert(gains.zip(gains.tail).forall { case (a, b) => b <= a })
    val pStar = (-0.5 + math.sqrt(0.25 + 4.0)) / 2
    val kStar = (pStar + 0.5) / (pStar + 0.5 + 2.0)
    assert(math.abs(gains.last - kStar) < 1e-6)
    // noisy series: the filter ends strictly between prior and data
    val two = Resample.kalmanLevel(Seq((1L, 1000L, 0.0), (1L, 2000L, 10.0))
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("value")), q = 0.5, r = 2.0)
      .orderBy("ts_us").collect().map(_.getAs[Double]("level"))
    assert(two.last > 0.0 && two.last < 10.0)
  }

  test("binarySegmentation: four planted regimes recovered exactly") {
    import spark.implicits._
    // 40 hourly points: levels 10/20/30/40 in blocks of 10 — level-0
    // splits at the middle boundary, each half at its own boundary
    val events = (0 until 40).map { h =>
      (1L, h * 3600L * 1000000L, "click", (h / 10 + 1) * 10.0)
    }.toDF("user_id", "us", "event_type", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"), col("value"))
    val segs = Resample.binarySegmentation(events).orderBy("segment")
      .collect()
      .map(r => (r.getAs[Long]("segment"), r.getAs[Long]("n_hours"),
        r.getAs[Double]("mean_value")))
    assert(segs.toSeq == Seq((1L, 10L, 10.0), (2L, 10L, 20.0),
      (3L, 10L, 30.0), (4L, 10L, 40.0)))
    // degenerate: a flat two-point series still reports full coverage
    val flat = Resample.binarySegmentation(
      Seq((1L, 0L, "click", 5.0), (1L, 3600L * 1000000L, "click", 5.0))
        .toDF("user_id", "us", "event_type", "value")
        .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
          col("event_type"), col("value")))
      .collect()
    assert(flat.map(_.getAs[Long]("n_hours")).sum == 2L)
  }

  test("ewma follows the recurrence exactly and preserves row counts") {
    import spark.implicits._
    val events = Seq(
      (1L, 1000L, 10.0), (1L, 2000L, 20.0), (1L, 3000L, 20.0),
      (2L, 1000L, 5.0)
    ).toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
    val out = Resample.ewma(events, 0.5).orderBy("user_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getAs[Double]("ewma")))
    // y1=10, y2=.5*20+.5*10=15, y3=.5*20+.5*15=17.5; user 2 seeds at 5
    assert(out.toSeq == Seq((1L, 10.0), (1L, 15.0), (1L, 17.5), (2L, 5.0)))
    // real table: one output row per input row, no NaNs
    val real = Resample.ewma(Tables.events(spark, sf), 0.3)
    assert(real.count() == Tables.events(spark, sf).count())
    assert(real.filter(col("ewma").isNaN || col("ewma").isNull).count() == 0)
  }

  test("holt tracks a linear trend; beta=0 degenerates to ewma exactly") {
    import spark.implicits._
    // a perfectly linear series: level locks on, the one-step forecast
    // converges toward the next point and the trend toward the slope
    val lin = Seq.tabulate(60)(i => (1L, (i + 1) * 1000L, 10.0 + 2.0 * i))
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
    val last = Resample.holt(lin, 0.5, 0.3).orderBy(desc("ts_us")).limit(1)
      .collect().head
    assert(math.abs(last.getAs[Double]("trend") - 2.0) < 1e-3,
      s"trend should converge to the slope, got ${last.getAs[Double]("trend")}")
    assert(math.abs(last.getAs[Double]("forecast_1") -
      (10.0 + 2.0 * 60)) < 1e-2, "one-step forecast should hit the next point")
    // beta=0 freezes the trend at 0: level IS the ewma recurrence
    val ev = Tables.events(spark, sf)
    val h0 = Resample.holt(ev, 0.3, 0.0)
      .select(col("user_id"), col("ts_us"), col("level").as("ewma"))
    val e = Resample.ewma(ev, 0.3)
    assert(h0.exceptAll(e).isEmpty && e.exceptAll(h0).isEmpty)
  }

  test("holtWinters learns a planted cycle; gamma=0 degenerates to holt exactly") {
    import spark.implicits._
    // pure period-4 signal, zero trend: the seasonal profile absorbs the
    // swing and last-cycle forecasts land on the series
    val pattern = Seq(10.0, 20.0, 30.0, 40.0)
    val per = Seq.tabulate(80)(i => (1L, (i + 1) * 1000L, pattern(i % 4)))
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
    val rows = Resample.holtWinters(per, 0.3, 0.0, 0.5, 4)
      .orderBy("ts_us").collect()
    // forecast_1 at position i predicts value at i+1
    val errs = rows.dropRight(1).zipWithIndex.map { case (r, i) =>
      math.abs(r.getAs[Double]("forecast_1") - pattern((i + 1) % 4))
    }
    val firstCycle = errs.take(4).max
    val lastCycle = errs.takeRight(4).max
    assert(lastCycle < 0.5, s"learned cycle should forecast well, err=$lastCycle")
    assert(lastCycle < firstCycle / 10,
      s"error must collapse vs the first cycle: first=$firstCycle last=$lastCycle")
    // gamma=0: seasonal stays 0 and the recurrence IS holt
    val ev = Tables.events(spark, sf)
    val hw = Resample.holtWinters(ev, 0.3, 0.1, 0.0, 24)
      .select("user_id", "ts_us", "level", "trend", "forecast_1")
    val h = Resample.holt(ev, 0.3, 0.1)
    assert(hw.exceptAll(h).isEmpty && h.exceptAll(hw).isEmpty)
    assert(Resample.holtWinters(ev, 0.3, 0.1, 0.0, 24)
      .filter(col("seasonal") =!= 0.0).count() == 0)
  }

  test("theilSen recovers a planted slope through a gross outlier; OLS would not") {
    import spark.implicits._
    // one event per hour, v = 3 + 2·hour, except hour 5 is corrupted to
    // 1000: the pairwise-slope median stays exactly 2 (most pairs avoid
    // the outlier) and the start-intercept stays exactly 3
    val rows = (0 until 12).map { h =>
      val v = if (h == 5) 1000.0 else 3.0 + 2.0 * h
      ("a", h * 3600L * 1000000L, v)
    }
    val events = rows.toDF("event_type", "us", "value")
      .select(col("event_type"), timestamp_micros(col("us")).as("ts"),
        col("value"))
    val r = Resample.theilSen(events).collect().head
    assert(r.getAs[Double]("slope") == 2.0, s"robust slope: $r")
    assert(r.getAs[Double]("intercept") == 3.0, s"robust intercept: $r")
    assert(r.getAs[Long]("n_hours") == 12L)
  }

  test("rollingCorrelation: ±1 on planted co-movement, full windows only") {
    import spark.implicits._
    // 30 hours; purchase = 2·click + 5 for the first 27 hours (corr 1
    // in any window), then mirrored (anti-correlated tail bleeds in)
    val rows = (0 until 30).flatMap { h =>
      val c = 10.0 + (h % 7)
      val p = if (h < 27) 2 * c + 5 else 100 - 3 * c
      Seq(("click", h * 3600L * 1000000L, c),
        ("purchase", h * 3600L * 1000000L, p))
    }
    val events = rows.toDF("event_type", "us", "value")
      .select(col("event_type"), timestamp_micros(col("us")).as("ts"),
        col("value"))
    val out = Resample.rollingCorrelation(events, "click", "purchase", 24)
      .orderBy("hr").collect()
    // hours 0..22 have partial windows and must be absent: 30 - 23 rows
    assert(out.length == 7 && out.forall(_.getAs[Long]("n_win") == 24L))
    assert(out.take(4).forall(_.getAs[Double]("corr") == 1.0),
      "windows fully inside the linear regime must hit corr exactly 1")
    assert(out.last.getAs[Double]("corr") < 1.0,
      "a window straddling the mirrored tail must drop below 1")
  }

  test("m4Downsample: first/last by time with event_id tiebreak, true extremes") {
    import spark.implicits._
    val ev = Seq(
      (2L, "a", 10L, 5.0),  // same ts as event 1 — higher id loses "first"
      (1L, "a", 10L, 3.0),  // first (ts tie → lower event_id)
      (3L, "a", 50L, 9.0),  // max
      (4L, "a", 99L, 1.0)   // last + min
    ).toDF("event_id", "event_type", "s", "value")
      .withColumn("ts", timestamp_seconds(col("s")))
    val r = Resample.m4Downsample(ev).collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("v_first") == 3.0,
      "equal-ts first must resolve by event_id")
    assert(r.getAs[Double]("v_last") == 1.0)
    assert(r.getAs[Double]("v_min") == 1.0 && r.getAs[Double]("v_max") == 9.0)
  }

  test("peaks: planted spike found, endpoints and plateaus never peak") {
    import spark.implicits._
    // one event per hour → hourly means [1,1,5,1,1]: only hour 2 peaks
    val ev = Seq(1.0, 1.0, 5.0, 1.0, 1.0).zipWithIndex.map { case (v, h) =>
      (h.toLong + 1L, "a", h.toLong * 3600L, v)
    }.toDF("event_id", "event_type", "s", "value")
      .withColumn("ts", timestamp_seconds(col("s")))
    val r = Resample.peaks(ev).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("hr") == 2L &&
      r.head.getAs[Double]("value") == 5.0)
    // a flat-top plateau has no STRICT local max
    val plat = Seq(1.0, 5.0, 5.0, 1.0).zipWithIndex.map { case (v, h) =>
      (h.toLong + 1L, "a", h.toLong * 3600L, v)
    }.toDF("event_id", "event_type", "s", "value")
      .withColumn("ts", timestamp_seconds(col("s")))
    assert(Resample.peaks(plat).isEmpty)
  }

  test("burstiness: metronome is exactly -1, bursts positive, midnight dropped") {
    import spark.implicits._
    def ev(rows: (Long, String, Long)*) =
      rows.toSeq.toDF("event_id", "event_type", "s")
        .withColumn("ts", timestamp_seconds(col("s")))
    // metronome: equal gaps → sd 0 → B = -1; memory null (zero variance)
    val m = Resample.burstiness(ev((1L, "m", 0L), (2L, "m", 10L),
      (3L, "m", 20L), (4L, "m", 30L))).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(m("m").getAs[Long]("n_gaps") == 3L)
    assert(m("m").getAs[Double]("burstiness") == -1.0)
    assert(m("m").isNullAt(m("m").fieldIndex("memory")))
    // long-silence burst: gaps 1,1,100 → sd > mean → B > 0
    val b = Resample.burstiness(ev((1L, "b", 0L), (2L, "b", 1L),
      (3L, "b", 2L), (4L, "b", 102L))).collect().head
    assert(b.getAs[Double]("burstiness") > 0.0)
    // two events straddling midnight UTC: the cross-day gap is dropped
    val x = Resample.burstiness(ev((1L, "x", 86390L), (2L, "x", 86405L)))
    assert(x.isEmpty, "cross-midnight gap must not produce a row")
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

  test("tsAnomaly flags a planted spike, stays silent on constant and cold series") {
    import spark.implicits._
    def series(u: Long, vals: Seq[Double]) = vals.zipWithIndex.map {
      case (v, i) => (u, (i + 1).toLong, 1000000L * (i + 1), v)
    }
    val rows =
      // user 1: steady noise around 10, one spike at the end
      series(1L, Seq(9.0, 11.0, 10.0, 9.5, 10.5, 9.0, 11.0, 10.0, 9.5,
        10.5, 9.8, 10.2, 500.0)) ++
      // user 2: perfectly constant — sd = 0, never flags
      series(2L, Seq.fill(15)(7.0)) ++
      // user 3: huge jump but only 3 prior points — below minN, silent
      series(3L, Seq(1.0, 1.1, 0.9, 400.0))
    val events = rows.toDF("user_id", "event_id", "us", "value")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"), col("value"))
    val out = Resample.tsAnomaly(events, lookback = 20, sigmas = 2.0, minN = 10)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")))
    assert(out.toSeq == Seq((1L, 13L)))
    // the z of the spike is enormous
    val z = Resample.tsAnomaly(events).collect().head.getAs[Double]("z")
    assert(z > 100.0)
  }

  test("granger: planted x→y lag causality shows asymmetric F") {
    import spark.implicits._
    val n = 500
    val rng = new java.util.Random(7L)
    val xs = Array.fill(n)(rng.nextGaussian())
    val ys = new Array[Double](n)
    ys(0) = rng.nextGaussian() * 0.1
    for (i <- 1 until n) ys(i) = 0.8 * xs(i - 1) + 0.1 * rng.nextGaussian()
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until n).flatMap { i =>
      val ts = new java.sql.Timestamp(base + i * 3600L * 1000)
      Seq((2L * i, ts, 1L, "click", xs(i), "{}"),
        (2L * i + 1, ts, 1L, "purchase", ys(i), "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Resample.granger(rows).collect()
      .map(r => r.getString(0) -> r).toMap
    val fwd = out("click->purchase")
    val rev = out("purchase->click")
    // the causal direction must dominate by orders of magnitude
    assert(fwd.getAs[Double]("f_stat") > 100.0,
      s"planted causality missed: $fwd")
    assert(rev.getAs[Double]("f_stat") < fwd.getAs[Double]("f_stat") / 10)
    // adding regressors can only shrink RSS
    out.values.foreach { r =>
      assert(r.getAs[Double]("rss_full") <=
        r.getAs[Double]("rss_restricted") + 1e-9)
    }
  }

  test("pacf: AR(1) process cuts off after lag 1; lag-0 is 1 by convention") {
    import spark.implicits._
    // AR(1), φ = 0.7, seeded-PRNG white noise (an additive-constant
    // mod walk or sin phase walk would leak its own autocorrelation)
    val n = 600
    val rng = new java.util.Random(42L)
    val xs = new Array[Double](n)
    xs(0) = rng.nextGaussian()
    for (i <- 1 until n) xs(i) = 0.7 * xs(i - 1) + rng.nextGaussian()
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val events = (0 until n).map(i => (i.toLong,
      new java.sql.Timestamp(base + i * 3600L * 1000), 1L, "click",
      xs(i), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Resample.pacf(events, "click", maxLag = 6).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(0) == ((1.0, 1.0)))
    val (acf1, pacf1) = out(1)
    assert(math.abs(pacf1 - 0.7) < 0.12, s"pacf(1)=$pacf1 should be ~0.7")
    assert(math.abs(acf1 - pacf1) < 1e-9, "lag-1 PACF equals lag-1 ACF")
    // the AR(1) signature: ACF still large at lag 2 (~φ²) while the
    // PACF has cut off
    assert(out(2)._1 > 0.3, s"acf(2)=${out(2)._1} should persist")
    (2 to 6).foreach { k =>
      assert(math.abs(out(k)._2) < 0.15,
        s"pacf($k)=${out(k)._2} must cut off for AR(1)")
    }
  }

  test("ljungBox: perfect alternation hits the closed-form Q, white-ish noise stays low") {
    import spark.implicits._
    def series(vs: Seq[Double]) = vs.zipWithIndex
      .map { case (v, h) => (h.toLong * 3600L, "click", v) }
      .toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    // v alternates ±1: ρ_k = (−1)^k exactly, so every ρ_k² = 1 and
    // Q = n(n+2)·Σ 1/(n−k) in closed form
    val n = 30
    val alt = series((0 until n).map(h => if (h % 2 == 0) 1.0 else -1.0))
    val r = Resample.ljungBox(alt).collect().head
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("maxlag") == 12L)
    val expected = n.toDouble * (n + 2.0) *
      (1 to 12).map(k => 1.0 / (n - k)).sum
    assert(math.abs(r.getAs[Double]("q_stat") - expected) < 1e-3,
      s"alternating series: ${r.getAs[Double]("q_stat")} vs $expected")
    // a hash-scrambled series carries far less structure
    val noisy = series((0 until n).map(h =>
      ((h * 2654435761L) % 97).toDouble))
    val q2 = Resample.ljungBox(noisy).collect().head.getAs[Double]("q_stat")
    assert(q2 < expected / 2, s"scrambled series must score lower: $q2")
  }

  test("mannKendall: monotone series maxes S, flat series zeroes it") {
    import spark.implicits._
    def ev(vs: Seq[Double]) = vs.zipWithIndex
      .map { case (v, h) => (h.toLong * 3600L, "click", v) }
      .toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    // strictly increasing, n=20: S = n(n−1)/2 = 190, strongly positive z
    val up = Resample.mannKendall(ev((1 to 20).map(_.toDouble))).collect().head
    assert(up.getAs[Long]("s") == 190L)
    assert(up.getAs[Long]("n") == 20L)
    assert(up.getAs[Double]("z") > 5.0)
    // constant series: every pair ties → S = 0, z = 0 (tie-corrected
    // variance also vanishes; the 0-branch must not divide)
    val flat = Resample.mannKendall(ev(Seq.fill(10)(7.0))).collect().head
    assert(flat.getAs[Long]("s") == 0L && flat.getAs[Double]("z") == 0.0)
    // reversal flips the sign exactly
    val down = Resample.mannKendall(ev((1 to 20).reverse.map(_.toDouble)))
      .collect().head
    assert(down.getAs[Long]("s") == -190L)
    assert(down.getAs[Double]("z") == -up.getAs[Double]("z"))
  }

  test("pettitt: a planted level shift is located exactly with the " +
      "hand-computed K; a flat series caps p at 1") {
    import spark.implicits._
    def ev(vs: Seq[Double]) = vs.zipWithIndex
      .map { case (v, h) => (h.toLong * 3600L, "click", v) }
      .toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    // 10 hours at 1 then 10 at 5: ranks are 5.5 / 15.5, U_t = 10t up
    // to the break then 200-10t -> K = 100 at the 10th hour (hr 9)
    val r = Resample.pettitt(ev(Seq.fill(10)(1.0) ++ Seq.fill(10)(5.0)))
      .collect().head
    assert(r.getAs[Long]("n") == 20L, s"$r")
    assert(r.getAs[Long]("k_stat") == 100L, s"$r")
    assert(r.getAs[Long]("t_star") == 9L, s"$r")
    val expP = BigDecimal(2.0 * math.exp(100.0 * 100.0 * -6.0 /
        (20.0 * 20.0 * 20.0 + 20.0 * 20.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("p_value") == expP, s"$r vs $expP")
    // constant series: every U_t = 0 -> K = 0, p capped at 1
    val flat = Resample.pettitt(ev(Seq.fill(12)(7.0))).collect().head
    assert(flat.getAs[Long]("k_stat") == 0L &&
      flat.getAs[Double]("p_value") == 1.0, s"$flat")
  }

  test("sampleEntropy: period-2 series is perfectly regular (SampEn 0); " +
      "a broken repeat scores exactly ln 2") {
    import spark.implicits._
    def ev(vs: Seq[Double]) = vs.zipWithIndex
      .map { case (v, h) => (h.toLong * 3600L, "click", v) }
      .toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    // [0,10]x4: all same-parity templates are identical -> every m=2
    // match extends to m=3, A=B=6, SampEn = -ln(1) = 0
    val per = Resample.sampleEntropy(
      ev(Seq(0.0, 10.0, 0.0, 10.0, 0.0, 10.0, 0.0, 10.0)))
      .collect().head
    assert(per.getAs[Long]("b") == 6L && per.getAs[Long]("a") == 6L,
      s"$per")
    assert(per.getAs[Double]("sampen") == 0.0, s"$per")
    // [0,10,0,10,0,0]: templates (0,10),(10,0),(0,10),(10,0) give B=2
    // but only one extends (the other's third step breaks) -> A=1,
    // SampEn = ln 2
    val broken = Resample.sampleEntropy(
      ev(Seq(0.0, 10.0, 0.0, 10.0, 0.0, 0.0))).collect().head
    assert(broken.getAs[Long]("b") == 2L &&
      broken.getAs[Long]("a") == 1L, s"$broken")
    assert(broken.getAs[Double]("sampen") == 0.693147, s"$broken")
  }

  test("periodogram: planted 24h cycle dominates every other candidate") {
    import spark.implicits._
    val ev = (0 until 24 * 14).map { h =>
      (h.toLong * 3600L, "click", 10.0 + 5.0 * math.cos(2 * math.Pi * h / 24.0))
    }.toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    val p = Resample.periodogram(ev).collect()
      .map(r => r.getAs[Int]("period") -> r.getAs[Double]("power")).toMap
    val best = p.maxBy(_._2)
    assert(best._1 == 24, s"the planted diurnal cycle must win: $p")
    assert(p.filter(_._1 != 24).values.forall(_ < best._2 / 10),
      s"off-period power must be an order of magnitude down: $p")
  }

  test("spectralEntropy: pure cycle near 0, spread spectrum high") {
    import spark.implicits._
    def ev(f: Int => Double) = (0 until 24 * 14).map { h =>
      (h.toLong * 3600L, "click", f(h))
    }.toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    val pure = Resample.spectralEntropy(
      ev(h => 10.0 + 5.0 * math.cos(2 * math.Pi * h / 24.0)))
      .collect().head
    assert(pure.getAs[Long]("n_periods") == 6)
    assert(pure.getAs[Double]("spectral_entropy") < 0.2,
      s"one planted cycle must concentrate the spectrum: $pure")
    // a sine of a quadratic phase spreads power across every candidate
    val spread = Resample.spectralEntropy(
      ev(h => 10.0 + 3.0 * math.sin(0.7 * h * h)))
      .collect().head
    assert(spread.getAs[Double]("spectral_entropy") > 0.6,
      s"broadband series must score near-flat: $spread")
  }

  test("conformalInterval: unit residual lattice gives q=1; one spike dents coverage") {
    import spark.implicits._
    // value = 100 + day → every day-over-day residual is exactly 1;
    // spike the LAST day's hour 5 (no next day to knock on)
    val nDays = 30
    val ev = (0 until 24 * nDays).map { h =>
      val (day, hod) = (h / 24, h % 24)
      val spike = if (day == nDays - 1 && hod == 5) 10.0 else 0.0
      (h.toLong * 3600L, "click", 100.0 + day + spike)
    }.toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    val r = Resample.conformalInterval(ev).collect().head
    // residual frame: 29 days; cal = first 14 → 336, test = 360
    assert(r.getAs[Long]("n_cal") == 336 && r.getAs[Long]("n_test") == 360)
    assert(r.getAs[Double]("q") == 1.0, s"$r")
    assert(r.getAs[Double]("coverage") ==
      math.floor((359.0 / 360) * 1e6 + 0.5) / 1e6, s"$r")
  }

  test("dayProfileOutliers: the campaign-spike day ranks first with the exact RMS") {
    import spark.implicits._
    // 10 identical days except day 7, whose hour 12 runs +9 hot: the
    // average profile at hod 12 shifts by +0.9, so day 7's deviation
    // there is 8.1 and every other day's is −0.9
    val ev = (0 until 24 * 10).map { h =>
      val (day, hod) = (h / 24, h % 24)
      val spike = if (day == 7 && hod == 12) 9.0 else 0.0
      (h.toLong * 3600L, "click", 10.0 + hod + spike)
    }.toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    val out = Resample.dayProfileOutliers(ev).collect()
    assert(out.head.getAs[Long]("day") == 7L, s"${out.toSeq}")
    val expTop = math.sqrt(8.1 * 8.1 / 24)
    assert(math.abs(out.head.getAs[Double]("rms_dev") - expTop) < 1e-4)
    val expRest = math.sqrt(0.9 * 0.9 / 24)
    out.tail.foreach(r =>
      assert(math.abs(r.getAs[Double]("rms_dev") - expRest) < 1e-4,
        s"non-spike days share the residual leak: $r"))
  }

  test("saxWords: recurring daily shape shares one word; the inverted day stands alone") {
    import spark.implicits._
    val ev = (0 until 24 * 6).map { h =>
      val (day, hod) = (h / 24, h % 24)
      val base = math.sin(2 * math.Pi * hod / 24.0)
      (h.toLong * 3600L, "click", 10.0 + (if (day == 5) -base else base))
    }.toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    val out = Resample.saxWords(ev).collect()
      .map(r => r.getAs[Long]("day") ->
        ((r.getAs[String]("word"), r.getAs[Long]("n_days_sharing"))))
      .toMap
    assert(out.size == 6)
    val (motif, share) = out(0L)
    assert(share == 5 && (0L to 4L).forall(out(_) == ((motif, 5L))),
      s"five identical shapes must share one word: $out")
    val complement = motif.map {
      case 'a' => 'd'; case 'b' => 'c'; case 'c' => 'b'; case 'd' => 'a'
    }
    assert(out(5L) == ((complement, 1L)),
      s"the sign-flipped day is the symbol-complement singleton: $out")
  }

  test("seasonalStrength: exact hourly pattern scores 1, hour-blind noise scores ~0") {
    import spark.implicits._
    def ev(f: (Int, Int) => Double) = (0 until 24 * 14).map { h =>
      (h.toLong, h.toLong * 3600L, "click", f(h % 24, h))
    }.toDF("event_id", "s", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("s")).as("ts"),
        col("event_type"), col("value"))
    // value is a pure function of hour-of-day → residual ≡ 0
    val pure = Resample.seasonalStrength(ev((hod, _) => 10.0 + hod))
      .collect().head
    assert(pure.getAs[Double]("seasonal_strength") == 1.0, s"$pure")
    // value cycles with period 5 — coprime to 24, so the hour-of-day
    // profile explains almost none of it (h%2 would NOT do: hod parity
    // pins h parity on an hourly grid)
    val blind = Resample.seasonalStrength(
      ev((_, h) => if (h % 5 == 0) 15.0 else 5.0)).collect().head
    assert(blind.getAs[Double]("seasonal_strength") < 0.1, s"$blind")
  }

  test("varianceRatio: walk near 1, alternation crushes VR(2), momentum inflates it") {
    import spark.implicits._
    def ev(f: Int => Double) = (0 until 400).map { h =>
      (h.toLong * 3600L, "click", f(h))
    }.toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    def vr(f: Int => Double) = Resample.varianceRatio(ev(f)).collect()
      .map(r => r.getAs[Int]("q") -> r.getAs[Double]("vr")).toMap
    // seeded-PRNG ±1 increments: a walk — VR stays in the vicinity of 1
    val rnd = new scala.util.Random(7)
    var acc = 0.0
    val walk = (0 until 400).map { _ =>
      acc += (if (rnd.nextBoolean()) 1.0 else -1.0); 100.0 + acc
    }
    val w = vr(h => walk(h))
    assert(w.values.forall(v => v > 0.5 && v < 1.6),
      s"iid increments must keep VR near 1: $w")
    // strict alternation: v_{t} − v_{t−2} = 0 exactly → VR(2) = 0
    val alt = vr(h => if (h % 2 == 0) 10.0 else 20.0)
    assert(alt(2) == 0.0, s"period-2 alternation must zero VR(2): $alt")
    // slowly-varying increments (momentum): q-step changes accumulate
    acc = 0.0
    val mom = (0 until 400).map { i => acc += math.sin(i * 0.05); acc }
    val m = vr(h => mom(h))
    assert(m(8) > 3.0, s"persistent increments must inflate VR(8): $m")
  }

  test("cointegration: shared-trend pair rejects a unit root, independent walks don't") {
    import spark.implicits._
    def ev(rows: Seq[(Long, String, Double)]) = rows
      .toDF("hr", "event_type", "value")
      .select(timestamp_seconds(col("hr") * 3600).as("ts"),
        col("event_type"), col("value"))
    // x = a deterministic pseudo-random walk (sine of a quadratic phase
    // gives effectively independent increments — a plain sin/cos cumsum
    // is quasi-periodic and BOUNDED, which is stationary, not a walk);
    // y = 2x + 5 + stationary wiggle
    val n = 120
    def inc(seed: Double)(h: Int) = math.sin(h * h * seed + h * 0.13)
    val walk = (0 until n).scanLeft(0.0)((a, h) => a + inc(0.7)(h)).tail
    val coint = ev((0 until n).flatMap(h => Seq(
      (h.toLong, "click", walk(h)),
      (h.toLong, "view", 2.0 * walk(h) + 5.0 + 0.1 * math.sin(h * 5.1)))))
    val rc = Resample.cointegration(coint).collect().head
    assert(math.abs(rc.getAs[Double]("beta") - 2.0) < 0.01)
    assert(rc.getAs[Double]("df_stat") < -5.0,
      s"stationary residuals must reject the unit root hard: $rc")
    // two INDEPENDENT walks: residuals wander, DF can't reject
    val walk2 = (0 until n).scanLeft(0.0)((a, h) => a + inc(1.9)(h)).tail
    val indep = ev((0 until n).flatMap(h => Seq(
      (h.toLong, "click", walk(h)), (h.toLong, "view", walk2(h)))))
    val ri = Resample.cointegration(indep).collect().head
      .getAs[Double]("df_stat")
    assert(ri > rc.getAs[Double]("df_stat") + 3.0,
      s"independent walks must look far less stationary: $ri vs $rc")
  }

  test("permutationEntropy: 0 on monotone, near 1 on a pattern-uniform series") {
    import spark.implicits._
    def ev(vs: Seq[Double]) = vs.zipWithIndex
      .map { case (v, h) => (h.toLong * 3600L, "click", v) }
      .toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    // strictly increasing: every triple is the same ordinal pattern
    val mono = Resample.permutationEntropy(
      ev((1 to 30).map(_.toDouble))).collect().head
    assert(mono.getAs[Long]("n_triples") == 28L)
    assert(mono.getAs[Long]("n_patterns") == 1L)
    assert(mono.getAs[Double]("perm_entropy") == 0.0)
    // irrational-rotation sampling (sin at integer steps) visits all
    // six ordinal patterns near-uniformly
    val noisy = Resample.permutationEntropy(
      ev((0 until 120).map(h => math.rint(math.sin(h) * 1e4) / 100)))
      .collect().head
    assert(noisy.getAs[Long]("n_patterns") == 6L)
    assert(noisy.getAs[Double]("perm_entropy") > 0.85,
      s"scrambled series must be near max entropy: $noisy")
  }

  test("dtwDistance: zero on elastic match, beats lockstep on shifted series") {
    import spark.implicits._
    def ev(rows: Seq[(String, Long, Double)]) = rows
      .toDF("event_type", "hr", "value")
      .select(col("event_type"), timestamp_seconds(col("hr") * 3600)
        .as("ts"), col("value"))
    // x=[1,2,3] vs y=[1,2,2,3]: DTW warps 2→{2,2} at zero cost even
    // though the lengths differ (lockstep distance is undefined)
    val elastic = ev(Seq(("click", 0L, 1.0), ("click", 1L, 2.0),
      ("click", 2L, 3.0), ("view", 0L, 1.0), ("view", 1L, 2.0),
      ("view", 2L, 2.0), ("view", 3L, 3.0)))
    val r = Resample.dtwDistance(elastic).collect().head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Double]("dtw") == 0.0)
    // a 2-hour phase shift of the same sawtooth: DTW absorbs the shift
    // (cost ≪ the lockstep sum of pointwise gaps)
    val saw = (0 until 24).map(h => (h % 6).toDouble)
    val shifted = ev(
      saw.zipWithIndex.map { case (v, h) => ("click", h.toLong, v) } ++
      saw.zipWithIndex.map { case (v, h) => ("view", h.toLong,
        saw((h + 2) % 24)) })
    val d = Resample.dtwDistance(shifted).collect().head
      .getAs[Double]("dtw")
    val lockstep = saw.indices.map(h =>
      math.abs(saw(h) - saw((h + 2) % 24))).sum
    assert(d < lockstep / 2,
      s"DTW $d must absorb the phase shift vs lockstep $lockstep")
    // empty series: sentinel -1, never a crash
    val one = ev(Seq(("click", 0L, 1.0)))
    assert(Resample.dtwDistance(one).collect().head
      .getAs[Double]("dtw") == -1.0)
  }

  test("backtestBaselines: drift nails a pure trend, naive and snaive lag it") {
    import spark.implicits._
    // v(hour h) = h+1 for 50 hours: train = first 40, holdout h = 1..10
    // drift slope = (40-1)/39 = 1 → exact forecasts, MAE 0
    // naive holds 40 → MAE = mean(1..10) = 5.5; snaive lags 24 → MAE 24
    val ev = (0 until 50).map(h => (h.toLong * 3600L, "click", h + 1.0))
      .toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    val out = Resample.backtestBaselines(ev).collect()
      .map(r => r.getAs[String]("method") ->
        (r.getAs[Long]("n"), r.getAs[Double]("mae"))).toMap
    assert(out.keySet == Set("naive", "drift", "snaive"))
    assert(out("drift")._1 == 10L && out("drift")._2 == 0.0,
      s"drift must be exact on a pure trend: ${out("drift")}")
    assert(out("naive")._2 == 5.5)
    assert(out("snaive")._2 == 24.0)
  }

  test("ar1HalfLife: exact geometric halving has rho 0.5, halflife 1 day") {
    import spark.implicits._
    // one event per DAY, value halving exactly: v_t = v_{t-1}/2 →
    // collinear (x, x/2) pairs → OLS slope exactly 0.5, halflife
    // ln2/−ln(0.5) = 1.0; values chosen so round(v·1e4) is exact 2^k
    val days = (0 until 15).map { i =>
      (i.toLong * 86400L, "click", math.pow(2.0, 16 - i) / 10000.0)
    }.toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    val r = Resample.ar1HalfLife(days).collect().head
    assert(r.getAs[Long]("n_pairs") == 14L)
    assert(math.abs(r.getAs[Double]("rho") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("halflife_days") - 1.0) < 1e-6)
    // a random-walk-ish rho ≥ 1 (strictly increasing doubling) reports
    // NULL halflife, not an error or a negative number
    val doubling = (0 until 10).map { i =>
      (i.toLong * 86400L, "click", math.pow(2.0, i) / 100.0)
    }.toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    val d = Resample.ar1HalfLife(doubling).collect().head
    assert(d.isNullAt(d.fieldIndex("halflife_days")))
  }

  test("turningPoints: sawtooth turns every interior day, monotone never") {
    import spark.implicits._
    def daily(vs: Seq[Double]) = vs.zipWithIndex.map { case (v, i) =>
      (i.toLong * 86400L, "click", v)
    }.toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    val saw = Resample.turningPoints(
      daily((0 until 10).map(i => if (i % 2 == 0) 1.0 else 5.0))).collect().head
    assert(saw.getAs[Long]("n_days") == 10L)
    assert(saw.getAs[Long]("n_turning") == 8L)
    assert(saw.getAs[Double]("z") > 0)
    val mono = Resample.turningPoints(
      daily((1 to 10).map(_.toDouble))).collect().head
    assert(mono.getAs[Long]("n_turning") == 0L)
    assert(mono.getAs[Double]("z") < -2.0,
      "a trend must be flagged as non-random")
  }

  test("seasonalMannKendall: day-over-day trend detected NET of a daily cycle plain MK misreads") {
    import spark.implicits._
    def ev(vs: Seq[(Int, Int, Double)]) = vs.map { case (d, h, v) =>
      ((d * 24L + h) * 3600L, "click", v)
    }.toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    // pure daily cycle, NO day-over-day trend: every within-season
    // pair ties -> S = 0, z = 0 (plain MK would see huge cross-hour S)
    val cyc = for (d <- 0 until 10; h <- 0 until 24)
      yield (d, h, 10.0 + (h % 12))
    val c = Resample.seasonalMannKendall(ev(cyc)).collect().head
    assert(c.getAs[Long]("s") == 0L && c.getAs[Double]("z") == 0.0, s"$c")
    assert(c.getAs[Long]("n_seasons") == 24L)
    // same cycle + a rising day term: every within-season pair is
    // positive -> S = 24 * C(10,2) = 1080, z strongly positive
    val tr = for (d <- 0 until 10; h <- 0 until 24)
      yield (d, h, 10.0 + (h % 12) + d)
    val t = Resample.seasonalMannKendall(ev(tr)).collect().head
    assert(t.getAs[Long]("s") == 1080L, s"$t")
    assert(t.getAs[Double]("z") > 5.0)
  }

  test("matrixProfile: repeated week matches at distance 0, the wild " +
      "week is the discord, and gap days void their windows") {
    import spark.implicits._
    def ev(vs: Seq[(Int, Double)]) = vs.map { case (d, v) =>
      (d * 86400L, "click", v)
    }.toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    // days 0-6 and 7-13 repeat the same weekly motif; days 14-20 are a
    // wildly different week (the discord)
    val motif = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0)
    val series = (motif ++ motif ++
      Seq(50.0, 60.0, 70.0, 80.0, 90.0, 100.0, 110.0)).zipWithIndex
      .map { case (v, d) => (d, v) }
    val mp = Resample.matrixProfile(ev(series)).collect()
      .map(r => (r.getAs[Long]("start_day"),
        (r.getAs[Long]("nn_day"), r.getAs[Long]("dist2")))).toMap
    // the two motif copies find each other exactly
    assert(mp(0L) == ((7L, 0L)) && mp(7L) == ((0L, 0L)), s"$mp")
    // the discord: the window with the LARGEST profile value starts
    // inside the wild week
    val discord = mp.maxBy { case (_, (_, d2)) => d2 }._1
    assert(discord >= 8L, s"discord at $discord: $mp")
    assert(mp.values.forall { case (_, d2) => d2 >= 0L })
    // a missing day voids every window that would span it: days 0-17
    // minus day 8 leaves complete starts {0,1,9,10,11} only
    val gappy = (0 to 17).filter(_ != 8).map(d => (d, (d % 7).toDouble))
    val g = Resample.matrixProfile(ev(gappy)).collect()
      .map(_.getAs[Long]("start_day")).sorted.toSeq
    assert(g == Seq(0L, 1L, 9L, 10L, 11L), s"$g")
  }

  test("haarEnergy: constant series is all-zero; 2-hour square wave puts every joule at level 1") {
    import spark.implicits._
    def hourly(vs: Seq[Double]) = vs.zipWithIndex.map { case (v, i) =>
      (i.toLong * 3600L, "click", v)
    }.toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    val flat = Resample.haarEnergy(hourly(Seq.fill(32)(7.5)), levels = 3)
      .collect()
    assert(flat.forall(_.getAs[Double]("energy") == 0.0))
    assert(flat.forall(_.getAs[Double]("share") == 0.0),
      "zero total energy must not divide by zero")
    // +1/-1 alternation: level-1 details are ±2 (in value units d²/2
    // per pair = 2); every coarser smooth is 0 -> all energy level 1
    val sq = Resample.haarEnergy(
      hourly((0 until 32).map(i => if (i % 2 == 0) 1.0 else -1.0)),
      levels = 3).collect()
      .map(r => r.getAs[Int]("level") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("energy"),
          r.getAs[Double]("share"))).toMap
    assert(sq(1) == ((16L, 32.0, 1.0)), s"$sq") // 16 pairs x d²/2 = 2
    assert(sq(2)._2 == 0.0 && sq(3)._2 == 0.0)
  }

  test("adfTest: reproduces the brute-force 3-regressor Dickey-Fuller " +
      "solve on a deterministic mean-reverting series") {
    import spark.implicits._
    // deterministic pseudo-noise around a level: strongly
    // mean-reverting, so the hand OLS has a healthy negative beta
    val w = (0 until 40).map(t => ((t * 37 + 11) % 100) / 10.0 + 5.0)
    val days = w.zipWithIndex.map { case (v, i) =>
      (i.toLong * 86400L, "click", v)
    }.toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    val r = Resample.adfTest(days).collect().head
    // brute-force twin on the same 1e4-quantized longs, identical
    // Cramer/variance formula order -> bit-equal doubles
    val vq = w.map(x => math.round(x * 10000).toDouble)
    val rows = (2 until vq.size).map(t =>
      (vq(t) - vq(t - 1), vq(t - 1), vq(t - 1) - vq(t - 2)))
    val n = rows.size.toDouble
    val sa = rows.map(_._2).sum; val sb = rows.map(_._3).sum
    val sy = rows.map(_._1).sum
    val saa = rows.map(r => r._2 * r._2).sum
    val sab = rows.map(r => r._2 * r._3).sum
    val sbb = rows.map(r => r._3 * r._3).sum
    val say = rows.map(r => r._2 * r._1).sum
    val sby = rows.map(r => r._3 * r._1).sum
    val syy = rows.map(r => r._1 * r._1).sum
    val det = n * (saa * sbb - sab * sab) - sa * (sa * sbb - sab * sb) +
      sb * (sa * sab - saa * sb)
    val d0 = sy * (saa * sbb - sab * sab) - sa * (say * sbb - sab * sby) +
      sb * (say * sab - saa * sby)
    val d1 = n * (say * sbb - sab * sby) - sy * (sa * sbb - sab * sb) +
      sb * (sa * sby - say * sb)
    val d2 = n * (saa * sby - say * sab) - sa * (sa * sby - say * sb) +
      sy * (sa * sab - saa * sb)
    val (a0, b1, b2) = (d0 / det, d1 / det, d2 / det)
    val sse = syy - a0 * sy - b1 * say - b2 * sby
    val seB = math.sqrt(sse / (n - 3.0) * (n * sbb - sb * sb) / det)
    def rd(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n") == 38L, s"$r")
    assert(r.getAs[Double]("beta") == rd(b1, 6), s"$r vs $b1")
    assert(r.getAs[Double]("gamma") == rd(b2, 6), s"$r vs $b2")
    assert(r.getAs[Double]("adf_t") == rd(b1 / seB, 4),
      s"$r vs ${b1 / seB}")
    // a stationary oscillation rejects hard: t deep below the 5%
    // Dickey-Fuller critical value -2.86
    assert(r.getAs[Double]("adf_t") < -2.86, s"$r")
  }

  test("demandClasses: one planted part per Syntetos-Boylan quadrant " +
      "plus the single-day bucket") {
    import spark.implicits._
    def li(rows: (Long, Int, Double)*) = rows.toSeq.map {
      case (pk, day, q) => (pk, day.toLong * 86400L, q) }
      .toDF("l_partkey", "s", "l_quantity")
      .select(col("l_partkey"),
        timestamp_seconds(col("s")).as("l_shipdate"), col("l_quantity"))
    val out = Resample.demandClasses(li(
      // part 1: every day, constant qty -> smooth (ADI 1, CV2 0)
      (1L, 0, 5.0), (1L, 1, 5.0), (1L, 2, 5.0), (1L, 3, 5.0),
      (1L, 4, 5.0),
      // part 2: two demands 8 days apart, equal qty -> intermittent
      (2L, 0, 5.0), (2L, 8, 5.0),
      // part 3: daily but one wild quantity -> erratic
      (3L, 0, 1.0), (3L, 1, 1.0), (3L, 2, 1.0), (3L, 3, 1.0),
      (3L, 4, 100.0),
      // part 4: sparse AND wild -> lumpy
      (4L, 0, 1.0), (4L, 9, 100.0),
      // part 5: a single demand day -> no interval exists
      (5L, 3, 7.0))).collect()
      .map(r => (r.getAs[String]("demand_class"),
        r.getAs[Long]("n_parts"))).toMap
    assert(out == Map("smooth" -> 1L, "intermittent" -> 1L,
      "erratic" -> 1L, "lumpy" -> 1L, "single" -> 1L), s"$out")
  }

  test("maxDrawdown: the slump measures peak-to-trough exactly; a " +
      "monotone series never draws down") {
    import spark.implicits._
    def ev(vs: Seq[Double]) = vs.zipWithIndex.map { case (v, d) =>
      (d.toLong * 86400L, "click", v) }
      .toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    // daily totals 100,150,120,90,130: peak 150, trough 90 -> dd 60
    val r = Resample.maxDrawdown(ev(Seq(100, 150, 120, 90, 130)))
      .collect().head
    assert(r.getAs[Long]("n_days") == 5L, s"$r")
    assert(r.getAs[Double]("max_drawdown") == 60.0, s"$r")
    assert(r.getAs[Double]("peak_revenue") == 150.0, s"$r")
    assert(r.getAs[java.sql.Date]("trough_day").toString
      == "1970-01-04", s"$r")
    // rising series: dd identically 0, earliest day reported
    val up = Resample.maxDrawdown(ev(Seq(10, 20, 30))).collect().head
    assert(up.getAs[Double]("max_drawdown") == 0.0, s"$up")
    assert(up.getAs[java.sql.Date]("trough_day").toString
      == "1970-01-01", s"$up")
  }

  test("spectralFlatness: a pure daily cycle concentrates power (low " +
      "flatness, dominant 24); a flat series short-circuits to 0") {
    import spark.implicits._
    def ev(vs: Seq[Double]) = vs.zipWithIndex.map { case (v, h) =>
      (h * 3600L, "click", v) }
      .toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    // 14 days of a pure 24h cosine (+ level): the spectrum piles onto
    // period 24 and flatness collapses
    val cyc = Resample.spectralFlatness(ev((0 until 336).map(h =>
      100.0 + 10.0 * math.cos(2 * math.Pi * h / 24.0)))).collect().head
    assert(cyc.getAs[Long]("dominant_period") == 24L, s"$cyc")
    assert(cyc.getAs[Double]("flatness") < 0.05, s"$cyc")
    // constant series: every power is 0 -> flatness exactly 0, no ln(0)
    val flat = Resample.spectralFlatness(
      ev(Seq.fill(48)(5.0))).collect().head
    assert(flat.getAs[Double]("flatness") == 0.0, s"$flat")
  }

  test("recurrenceMetrics: periodic dynamics score high det1, an " +
      "isolated revisit scores zero; rr counts exact integer matches") {
    import spark.implicits._
    def ev(vs: Seq[Double]) = vs.zipWithIndex.map { case (v, h) =>
      (h * 3600L, "click", v) }
      .toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    // 10,20,10,20,10,20: sd-scaled r ~ 1.095 so only exact value
    // matches recur: 6 of 15 pairs (rr = 0.4); of those, the 4 with a
    // successor continue the period-2 orbit -> det1 = 4/6
    val per = Resample.recurrenceMetrics(
      ev(Seq(10, 20, 10, 20, 10, 20))).collect().head
    assert(per.getAs[Long]("npairs") == 15L &&
      per.getAs[Long]("nrec") == 6L, s"$per")
    assert(per.getAs[Double]("rr") == 0.4, s"$per")
    assert(per.getAs[Double]("det1") == 0.666667, s"$per")
    // 10,10,20,10: three scattered revisits of the base level, none
    // followed by a second match -> rr = 0.5, det1 = 0
    val iso = Resample.recurrenceMetrics(
      ev(Seq(10, 10, 20, 10))).collect().head
    assert(iso.getAs[Double]("rr") == 0.5, s"$iso")
    assert(iso.getAs[Double]("det1") == 0.0, s"$iso")
  }

  test("kpssTest: reproduces the brute-force Bartlett-kernel eta; a " +
      "trending series scores far above a stationary one") {
    import spark.implicits._
    def ev(w: Seq[Double]) = w.zipWithIndex.map { case (v, i) =>
      (i.toLong * 86400L, "click", v)
    }.toDF("s", "event_type", "value")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"),
        col("value"))
    def brute(w: Seq[Double]): Double = {
      val vq = w.map(x => math.round(x * 10000))
      val n = vq.size.toLong
      val sv = vq.sum
      val ej = vq.map(v => n * v - sv)
      val cv = vq.scanLeft(0L)(_ + _).tail
      val sn = cv.zipWithIndex.map { case (c, i) =>
        n * c - (i + 1).toLong * sv }
      def dot(l: Int) = (l until ej.size).map(t =>
        BigInt(ej(t)) * BigInt(ej(t - l))).sum.toDouble
      val ssn2 = sn.map(s => BigInt(s) * BigInt(s)).sum.toDouble
      val g = dot(0) + 2.0 * (0.8 * dot(1) + 0.6 * dot(2) +
        0.4 * dot(3) + 0.2 * dot(4))
      BigDecimal(ssn2 / (n.toDouble * g))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val stat = (0 until 40).map(t => ((t * 37 + 11) % 100) / 10.0 + 5.0)
    val trend = (0 until 40).map(t =>
      t * 2.0 + ((t * 37 + 11) % 100) / 100.0)
    val rs = Resample.kpssTest(ev(stat)).collect().head
    val rt = Resample.kpssTest(ev(trend)).collect().head
    assert(rs.getAs[Long]("n") == 40L, s"$rs")
    assert(rs.getAs[Double]("kpss_eta") == brute(stat), s"$rs")
    assert(rt.getAs[Double]("kpss_eta") == brute(trend), s"$rt")
    // level-stationary noise sits under the 5% critical value 0.463;
    // the deterministic trend clears the 1% value 0.739 (0.91 at n=40
    // — the Bartlett kernel at lag 4 absorbs some of the drift, so the
    // small-sample statistic plateaus well short of its asymptote)
    assert(rs.getAs[Double]("kpss_eta") < 0.463, s"$rs")
    assert(rt.getAs[Double]("kpss_eta") > 0.739, s"$rt")
  }
}
