package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand/brute-force twins for the third round-10 wave. */
class Wave10cSpec extends SparkSpec {

  import spark.implicits._

  private def pairEvents(f: Int => (Double, Double), n: Int = 40) =
    (0 until n).flatMap { d =>
      val (x, y) = f(d)
      Seq((d * 86400L, "click", x), (d * 86400L, "view", y))
    }.zipWithIndex.map { case ((s, t, v), i) => (i.toLong, s, t, v) }
      .toDF("event_id", "s", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("s")).as("ts"),
        lit(1L).as("user_id"), col("event_type"), col("value"))

  test("chatterjeeXi: y = f(x) drives xi(y|x) toward 1 even for a " +
      "NON-monotone f, and the coefficient is asymmetric") {
    // V-shape: y = |d - 20| is a deterministic function of x = d, but
    // x is NOT a function of y (two x per y) -> xi asymmetry
    val ev = pairEvents(d => (10.0 + d, 10.0 + math.abs(d - 20)))
    val r = Stats.chatterjeeXi(ev).collect().head
    val xiYX = r.getAs[Double]("xi_y_given_x")
    val xiXY = r.getAs[Double]("xi_x_given_y")
    assert(xiYX > 0.7, s"functional dependence must read high: $xiYX")
    assert(xiYX > xiXY + 0.2, s"asymmetry: $xiYX vs $xiXY")
    // hand check the exact formula on a tiny frame: x=d, y ranks
    // reversed -> sorted by x the y-ranks are n..1, sum|dr| = n-1
    // xi = 1 - 3(n-1)/(n^2-1) = 1 - 3/(n+1)
    val tiny = pairEvents(d => (10.0 + d, 100.0 - d), n = 9)
    val t = Stats.chatterjeeXi(tiny).collect().head
    assert(math.abs(t.getAs[Double]("xi_y_given_x") - (1.0 - 3.0 / 10)) < 1e-6)
  }

  test("mmdTest: identical distributions read ~0; a large shift reads " +
      "strongly positive and grows with the shift") {
    val same = Stats.mmdTest(pairEvents(d =>
      (10.0 + (d % 7), 10.0 + ((d + 3) % 7)))).collect().head
    assert(math.abs(same.getAs[Double]("mmd2")) < 0.05,
      s"same-support series: ${same.getAs[Double]("mmd2")}")
    val far = Stats.mmdTest(pairEvents(d =>
      (10.0 + (d % 7), 400.0 + (d % 7)))).collect().head
    assert(far.getAs[Double]("mmd2") > 1.5,
      s"disjoint-support series: ${far.getAs[Double]("mmd2")}")
    val near = Stats.mmdTest(pairEvents(d =>
      (10.0 + (d % 7), 60.0 + (d % 7)))).collect().head
    assert(far.getAs[Double]("mmd2") > near.getAs[Double]("mmd2"),
      "MMD must grow with the shift")
    assert(near.getAs[Double]("mmd2") > 0.0)
  }

  test("audioDecimateSummary: hand bytes — boxcar means, counts, and " +
      "energy ratio match a direct computation") {
    // doc_id % 3 == 1 -> audio. 6 chars: samples s_i = (b_i-128)*256
    val text = "ABCDEF" // bytes 65..70 -> s = (b-128)*256
    val docs = Seq((1L, text, "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val r = Multimodal.audioDecimateSummary(docs).collect().head
    assert(r.getAs[Long]("n_in") == 6 && r.getAs[Long]("n_out") == 2)
    val s = "ABCDEF".map(c => ((c.toInt - 128) * 256).toDouble)
    val m = Seq(s.take(4).sum / 4, s.drop(4).sum / 2)
    val rmsIn = math.sqrt(s.map(v => (v / 32768) * (v / 32768)).sum / 6)
    val rmsOut = math.sqrt(m.map(v => (v / 32768) * (v / 32768)).sum / 2)
    assert(math.abs(r.getAs[Double]("rms_out") -
      math.floor(rmsOut * 1e4 + 0.5) / 1e4) < 1e-9 ||
      math.abs(r.getAs[Double]("rms_out") - rmsOut) < 1e-4)
    assert(math.abs(r.getAs[Double]("energy_ratio") - rmsOut / rmsIn) < 1e-3)
  }

  test("hmmViterbi: sticky transitions smooth a single-hour flicker " +
      "but follow a sustained regime change") {
    // 20 low hours (with one high flicker at t=10), then 20 high hours
    // (with one low flicker at t=30). The flicker costs one emission
    // miss (~1.39e6 micro-nats) vs two switches (~4.39e6) -> Viterbi
    // holds the regime; the sustained block flips it.
    val obs = (0 until 40).map { t =>
      val base = if (t < 20) 10.0 else 90.0
      val v = if (t == 10) 90.0 else if (t == 30) 10.0 else base
      (t * 3600L, "click", v)
    }
    val ev = obs.zipWithIndex.map { case ((s, t, v), i) => (i.toLong, s, t, v) }
      .toDF("event_id", "s", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("s")).as("ts"),
        lit(1L).as("user_id"), col("event_type"), col("value"))
    val out = Resample.hmmViterbi(ev).collect()
      .map(r => r.getAs[Long]("hr") -> r.getAs[Int]("state")).toMap
    assert(out.size == 40)
    (0 until 20).foreach(t => assert(out(t) == 0, s"hour $t: ${out(t)}"))
    (20 until 40).foreach(t => assert(out(t) == 1, s"hour $t: ${out(t)}"))
    // in particular the two flicker hours are SMOOTHED over
    assert(out(10) == 0 && out(30) == 1)
  }

  test("minimumSpanningForest: equals serial Kruskal on a planted " +
      "weighted graph and on the real co-purchase sample") {
    // planted: square 1-2-3-4 with a heavy diagonal; MST drops the
    // max-weight cycle edges
    val planted = Seq(
      (1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L), (4L, 1L, 4L),
      (1L, 3L, 10L)).toDF("src", "dst", "w")
    val got = Graph.minimumSpanningForest(planted).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"),
        r.getAs[Long]("w"))).toSet
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L)), s"$got")

    // brute force Kruskal (union-find) on the real weighted graph
    val orders = graft.Tables.orders(spark, sf)
    val li = graft.Tables.lineitem(spark, sf)
    val w = orders.join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("src"),
        (col("l_suppkey") + 1000000000L).as("dst"))
      .agg(countDistinct("o_orderkey").as("w"))
    val edges = w.collect().map(r =>
      (r.getAs[Long]("src"), r.getAs[Long]("dst"), r.getAs[Long]("w")))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val kruskal = edges
      .map { case (s, t, ww) => (ww, math.min(s, t), math.max(s, t)) }
      .sorted
      .flatMap { case (ww, s, t) =>
        val (rs, rt) = (find(s), find(t))
        if (rs == rt) None
        else { parent(math.max(rs, rt)) = math.min(rs, rt); Some((s, t, ww)) }
      }.toSet
    val dist = Graph.minimumSpanningForest(w).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"),
        r.getAs[Long]("w"))).toSet
    assert(dist == kruskal,
      s"forest mismatch: ${dist.size} vs ${kruskal.size}; " +
        s"only-dist=${(dist -- kruskal).take(3)} " +
        s"only-kruskal=${(kruskal -- dist).take(3)}")
  }
}
