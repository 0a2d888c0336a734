package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand twins for the fourth round-10 wave (percolation, EVT tail,
  * inter-arrival exponentiality). */
class Wave10dSpec extends SparkSpec {

  import spark.implicits._

  test("percolationCurve: planted weighted graph loses its bridge as " +
      "tau rises; giant share is monotone non-increasing") {
    // two triangles (internal w=3) joined by a w=1 bridge
    val w = Seq(
      (1L, 2L, 3L), (2L, 3L, 3L), (1L, 3L, 3L),
      (4L, 5L, 3L), (5L, 6L, 3L), (4L, 6L, 3L),
      (3L, 4L, 1L)).toDF("src", "dst", "w")
    val out = Graph.percolationCurve(w, Seq(1L, 2L, 3L, 4L)).collect()
      .map(r => r.getAs[Long]("tau") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
          r.getAs[Long]("n_components"),
          Option(r.get(r.fieldIndex("giant_share")))
            .map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) == ((6L, 7L, 1L, Some(1.0))), s"${out(1L)}")
    assert(out(2L) == ((6L, 6L, 2L, Some(0.5))), s"${out(2L)}")
    assert(out(3L) == ((6L, 6L, 2L, Some(0.5))), s"${out(3L)}")
    assert(out(4L) == ((0L, 0L, 0L, None)), s"${out(4L)}")
    val shares = Seq(1L, 2L, 3L).map(t => out(t)._4.get)
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b })
  }

  test("potTailFit: matches a hand PWM computation on planted " +
      "exceedances") {
    // 20 values: 19 at 1.00 (body), tail 5 at 2/4/8/16/32 after the
    // p95 cut -- build 100 points so p95 is clean: 95 points at 1.00,
    // exceedances 2,4,8,16,32
    val vals = Seq.fill(95)(1.00) ++ Seq(2.0, 4.0, 8.0, 16.0, 32.0)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, i * 60L, "click", v)
    }.toDF("event_id", "s", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("s")).as("ts"),
        lit(1L).as("user_id"), col("event_type"), col("value"))
    val r = Stats.potTailFit(ev).collect().head
    val n = r.getAs[Long]("n_exceed")
    val u = r.getAs[Double]("threshold")
    // hand PWM on the exceedances y_i = v_i - u (ascending)
    val cents = Seq(200L, 400L, 800L, 1600L, 3200L)
      .filter(_ > u * 100)
    val ys = cents.map(c => (c - u * 100) / 100.0).sorted
    val m = ys.length.toDouble
    val b0 = ys.sum / m
    val b1 = ys.zipWithIndex.map { case (y, i) => i * y }.sum / (m - 1) / m
    val xi = 2.0 - b0 / (b0 - 2 * b1)
    val sigma = 2.0 * b0 * b1 / (b0 - 2 * b1)
    assert(n == ys.length, s"n=$n vs ${ys.length} (u=$u)")
    assert(math.abs(r.getAs[Double]("xi") - xi) < 1e-4,
      s"${r.getAs[Double]("xi")} vs $xi")
    assert(math.abs(r.getAs[Double]("sigma") - sigma) < 1e-4,
      s"${r.getAs[Double]("sigma")} vs $sigma")
    // geometric (heavy) tail must read a clearly positive shape
    assert(r.getAs[Double]("xi") > 0.0)
  }

  test("interArrivalTest: constant gaps score the closed-form " +
      "1 - 1/e distance; near-exponential gaps score small") {
    def purchases(gaps: Seq[Double]) = {
      val times = gaps.scanLeft(0.0)(_ + _)
      times.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "purchase", 1.0)
      }.toDF("event_id", "s", "event_type", "value")
        .select(col("event_id"),
          timestamp_seconds(col("s")).as("ts"), lit(1L).as("user_id"),
          col("event_type"), col("value"))
    }
    val const = Stats.interArrivalTest(purchases(Seq.fill(50)(60.0)))
      .collect().head
    assert(const.getAs[Long]("n_gaps") == 50)
    assert(math.abs(const.getAs[Double]("ks_d") - (1 - 1 / math.E)) < 1e-3,
      s"${const.getAs[Double]("ks_d")}")
    assert(math.abs(const.getAs[Double]("lambda") - 1.0 / 60) < 1e-6)
    // exponential quantiles (a perfect exp sample): D small
    val n = 200
    val expGaps = (1 to n).map(i => -60.0 * math.log(1 - (i - 0.5) / n))
    val ex = Stats.interArrivalTest(
      purchases(scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).shuffle(expGaps.toList))).collect().head
    assert(ex.getAs[Double]("ks_d") < 0.1,
      s"exp sample D: ${ex.getAs[Double]("ks_d")}")
  }
}
