package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hand-computed / brute-force twins for the round-10 operator wave. */
class Wave10Spec extends SparkSpec {

  import spark.implicits._

  private def eventsOf(rows: Seq[(Long, String, Double)]): DataFrame =
    rows.zipWithIndex.map { case ((s, t, v), i) =>
      (i.toLong, s, t, v)
    }.toDF("event_id", "s", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("s")).as("ts"),
        lit(1L).as("user_id"), col("event_type"), col("value"))

  test("fTestVariance: exact two-group variance ratio on hand data") {
    // click: 1.00 2.00 3.00 -> var 1.0; view: 10.00 10.00 14.00 ->
    // mean 34/3, sum sq dev = 2*(4/3)^2 + (8/3)^2 = 96/9, /2 -> 16/3
    val ev = eventsOf(Seq(
      (0L, "click", 1.00), (3600L, "click", 2.00), (7200L, "click", 3.00),
      (0L, "view", 10.00), (3600L, "view", 10.00), (7200L, "view", 14.00)))
    val r = Stats.fTestVariance(ev).collect().head
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("df_b") == 2)
    assert(r.getAs[Double]("var_a") == 1.0)
    // view variance: mean 11.333.., sum sq dev = (4/3)^2*2+(8/3)^2
    //  = 32/9+64/9 = 96/9; /2 -> 16/3 = 5.333333
    assert(math.abs(r.getAs[Double]("var_b") - 16.0 / 3) < 1e-5)
    assert(math.abs(r.getAs[Double]("f_stat") - 3.0 / 16) < 1e-5)
  }

  test("chiSquareGof: collapses to the exact rational (k*sum(o^2)-n^2)/n") {
    // counts 6, 2, 4 -> k=3 n=12 sum o^2=56: chi2=(168-144)/12 = 2.0
    val ev = eventsOf(
      Seq.fill(6)(("click", 1.0)).zipWithIndex.map { case ((t, v), i) => (i * 60L, t, v) } ++
      Seq.fill(2)(("view", 1.0)).zipWithIndex.map { case ((t, v), i) => (i * 60L, t, v) } ++
      Seq.fill(4)(("purchase", 1.0)).zipWithIndex.map { case ((t, v), i) => (i * 60L, t, v) })
    val r = Stats.chiSquareGof(ev).collect().head
    assert(r.getAs[Long]("k") == 3 && r.getAs[Long]("n") == 12 &&
      r.getAs[Long]("df") == 2)
    assert(r.getAs[Double]("chi2") == 2.0)
  }

  test("betaBinomial: exact Beta(k+1, n-k+1) posterior moments") {
    // one arm, n=8, k=2 (value>95): Beta(3,7) mean 0.3, MAP 0.25,
    // var = 21/(100*11) = 0.019091
    val ev = eventsOf((0 until 8).map(i =>
      (i * 60L, "click", if (i < 2) 100.0 else 50.0)))
    val r = Stats.betaBinomial(ev).collect().head
    assert(r.getAs[Long]("n") == 8 && r.getAs[Long]("k") == 2)
    assert(r.getAs[Double]("post_mean") == 0.3)
    assert(r.getAs[Double]("post_map") == 0.25)
    assert(math.abs(r.getAs[Double]("post_var") - 21.0 / 1100) < 1e-6)
    assert(r.getAs[Double]("ci_lo") >= 0.0 && r.getAs[Double]("ci_hi") <= 1.0)
    assert(r.getAs[Double]("ci_lo") < 0.3 && r.getAs[Double]("ci_hi") > 0.3)
  }

  test("transferEntropy: a series driven by the other's past reads " +
      "strongly directional; the reverse direction reads ~zero") {
    // y_t = deterministic pseudo-random bit; x_{t+1} = y_t (copy with
    // lag 1). Knowing y_t pins x_{t+1}; knowing x_t tells ~nothing
    // about y_{t+1}.
    def bit(t: Int): Int = ((t * 2654435761L >>> 13) & 1L).toInt
    val hours = 0 until 256
    val ev = eventsOf(
      hours.map(t => (t * 3600L, "view", 10.0 + 80.0 * bit(t))) ++
      hours.map(t => (t * 3600L, "click",
        10.0 + 80.0 * (if (t == 0) 0 else bit(t - 1)))))
    val r = Resample.transferEntropy(ev).collect().head
    val teYX = r.getAs[Double]("te_y_to_x")
    val teXY = r.getAs[Double]("te_x_to_y")
    assert(r.getAs[Long]("n_steps") == 255)
    assert(teYX > 0.3, s"driver direction must carry information: $teYX")
    assert(teXY < 0.1, s"reverse direction must carry ~none: $teXY")
    assert(teYX > 3 * math.max(teXY, 1e-9))
  }

  test("lombScargle: a pure 7-day cycle sampled on a GAPPY calendar " +
      "peaks at period 7") {
    // days 0..119 but only days not divisible by 3 observed (gaps!)
    val days = (0 until 120).filterNot(_ % 3 == 0)
    val ev = eventsOf(days.map(d => (d * 86400L, "purchase",
      50.0 + 30.0 * math.sin(2 * math.Pi * d / 7.0))))
    val out = Resample.lombScargle(ev).collect()
      .map(r => r.getAs[Int]("period") -> r.getAs[Double]("power")).toMap
    assert(out.keySet == Set(3, 5, 7, 14, 30))
    assert(out(7) > 5 * out(5) && out(7) > 5 * out(14),
      s"7-day power must dominate: $out")
  }

  test("dfaAlpha: matches a plain-Scala brute-force replication on a " +
      "deterministic series, and white noise reads alpha ~0.5") {
    def noise(t: Int): Double =
      ((t * 1103515245L + 12345L) % 1000L).toDouble / 10.0
    val n = 128
    val ev = eventsOf((0 until n).map(t => (t * 3600L, "click", noise(t))))
    val rows = Resample.dfaAlpha(ev).collect()
    val alpha = rows.head.getAs[Double]("alpha")
    // brute force twin (same exact-micro quantization: one event/hour
    // with 1 decimal -> v = value*1e6 exactly)
    val v = (0 until n).map(t => math.floor(noise(t) * 100 + 0.5) * 10000)
    val s = v.sum; val prof = v.scanLeft(0.0)((a, x) => a + x * n - s).tail
      .map(_ / n)
    def fm(m: Int): Double = {
      val boxes = prof.take(n / m * m).grouped(m).toSeq
      val sses = boxes.map { ys =>
        val xs = (1 to m).map(_.toDouble)
        val c = m.toDouble
        val (sx, sxx) = (xs.sum, xs.map(x => x * x).sum)
        val (sy, syy, sxy) = (ys.sum, ys.map(y => y * y).sum,
          xs.zip(ys).map { case (a, b) => a * b }.sum)
        (syy - sy * sy / c) - math.pow(sxy - sx * sy / c, 2) /
          (sxx - sx * sx / c)
      }
      math.sqrt(sses.map(_ / m).sum / sses.size)
    }
    val ms = Seq(4, 8, 16, 32)
    val lx = ms.map(m => math.log(m.toDouble))
    val ly = ms.map(m => math.log(fm(m)))
    val k = 4.0
    val expected = (lx.zip(ly).map { case (a, b) => a * b }.sum -
      lx.sum * ly.sum / k) /
      (lx.map(x => x * x).sum - lx.sum * lx.sum / k)
    assert(math.abs(alpha - expected) < 1e-4, s"$alpha vs $expected")
    assert(alpha > 0.2 && alpha < 0.8, s"white-ish noise alpha: $alpha")
    rows.foreach(r => assert(r.getAs[Double]("f_m") > 0.0))
  }

  test("boilerplateProfile: a footer stamped on most of a source is " +
      "flagged; small sources are exempt") {
    val big = (1L to 10L).map(i =>
      (i, s"the same footer every page here u$i v$i w$i x$i", "en", "bigsrc"))
    // footer 5-grams appear in 10/10 docs (> 25%), source >= 8 docs
    val small = (101L to 103L).map(i =>
      (i, s"tiny source shared line here a$i b$i c$i d$i", "en", "smallsrc"))
    val docs = (big ++ small).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val out = TextAnalysis.boilerplateProfile(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_boiler"))).toMap
    // big docs: 10 tokens -> 6 distinct 5-grams; the 2 grams free of
    // the per-doc suffix ("the same footer every page", "same footer
    // every page here") are shared by all 10 docs -> hot
    big.foreach { case (i, _, _, _) =>
      val (ng, nb) = out(i)
      assert(ng == 6, s"doc $i grams $ng")
      assert(nb == 2, s"doc $i boiler $nb")
    }
    // small source: shares 4 grams across its 3 docs but is exempt
    small.foreach { case (i, _, _, _) => assert(out(i)._2 == 0L) }
  }

  test("scd4View: current state, version count, first/last timestamps " +
      "from a hand change stream") {
    val ev = Seq(
      (1L, 0L, "a"), (2L, 100L, "a"),  // no-change collapses
      (3L, 200L, "b"), (4L, 300L, "a") // two real transitions
    ).toDF("event_id", "s", "event_type")
      .select(col("event_id"), timestamp_seconds(col("s")).as("ts"),
        lit(7L).as("user_id"), col("event_type"))
    val r = Dwh.scd4View(ev, "user_id", "event_type", "ts", "event_id")
      .collect().head
    assert(r.getAs[String]("current_state") == "a")
    assert(r.getAs[Long]("n_versions") == 3)
    assert(r.getAs[java.sql.Timestamp]("first_seen").getTime == 0L)
    assert(r.getAs[java.sql.Timestamp]("last_changed").getTime == 300000L)
  }

  test("hexbinDensity: points land in the hex whose center is nearest " +
      "(cube rounding), shares sum to ~1 on few cells") {
    val out = SpatialJoin.hexbinDensity(graft.Tables.customer(spark, sf))
      .collect()
    assert(out.nonEmpty && out.length <= 15)
    val shares = out.map(_.getAs[Double]("share"))
    assert(shares.forall(s => s > 0 && s <= 1))
    // counts ordered desc with (q, r) tiebreak
    val counts = out.map(_.getAs[Long]("n_points"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // partition property: with no top-N cutoff every point lands in
    // exactly one hex
    val cust = graft.Tables.customer(spark, sf)
    val all = SpatialJoin.hexbinDensity(cust, topN = 1000000).collect()
    assert(all.map(_.getAs[Long]("n_points")).sum == cust.count())
    // INDEPENDENT nearest-center check (exhaustive search vs the
    // operator's cube rounding): for sample customers, the assigned
    // hex center must be the Euclidean-nearest center in the (lon,
    // lat) plane among all hexes within +-3 of the unrounded axial
    // coords. Pointy-top centers: lon = s*sqrt(3)*(q + r/2),
    // lat = s*1.5*r.
    val s8 = 8.0
    def center(q: Long, r: Long): (Double, Double) =
      (s8 * math.sqrt(3.0) * (q + r / 2.0), s8 * 1.5 * r)
    val sample = cust.limit(10).collect().map(_.getAs[Long]("c_custkey"))
    sample.foreach { ck =>
      val lat = math.floor(((ck * 17) % 1400) / 10.0 * 10000 + 0.5) / 10000 - 70.0
      val lon = math.floor(((ck * 31) % 3600) / 10.0 * 10000 + 0.5) / 10000 - 180.0
      val qf = (lon * (math.sqrt(3.0) / 3.0) - lat / 3.0) / s8
      val rf = lat * (2.0 / 3.0) / s8
      val cands = for {
        dq <- -3L to 3L; dr <- -3L to 3L
      } yield (math.round(qf) + dq, math.round(rf) + dr)
      val best = cands.minBy { case (q, r) =>
        val (cx, cy) = center(q, r)
        (cx - lon) * (cx - lon) + (cy - lat) * (cy - lat)
      }
      val one = Seq((ck, "x", 0L)).toDF("c_custkey", "c_name", "c_nationkey")
      val h = SpatialJoin.hexbinDensity(one).collect().head
      assert((h.getAs[Long]("hex_q"), h.getAs[Long]("hex_r")) == best,
        s"custkey $ck: operator ${(h.getLong(0), h.getLong(1))} vs " +
          s"exhaustive $best")
    }
  }

  test("idwDensity: an exact-hit probe snaps to its cell value; a " +
      "symmetric midpoint probe reads between its neighbors") {
    val out = SpatialJoin.idwDensity(graft.Tables.customer(spark, sf))
      .collect()
    assert(out.length == 4)
    val cells = SpatialJoin.idwDensity(graft.Tables.customer(spark, sf))
    out.foreach { r =>
      val v = r.getAs[Double]("idw_density")
      assert(!v.isNaN && v > 0.0)
    }
    // IDW is a convex combination: every estimate lies within the
    // min..max cell density range
    val dens = graft.operators.SpatialJoin
      .gridDensity(graft.Tables.customer(spark, sf), topN = 10000)
      .collect().map(_.getAs[Long]("n_points"))
    val (lo, hi) = (dens.min.toDouble, dens.max.toDouble)
    out.foreach { r =>
      val v = r.getAs[Double]("idw_density")
      assert(v >= lo - 1e-9 && v <= hi + 1e-9, s"IDW $v outside [$lo,$hi]")
    }
  }
}
