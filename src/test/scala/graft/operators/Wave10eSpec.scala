package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand twins for the fifth round-10 wave (LISA, AMI ladder, VARIANT). */
class Wave10eSpec extends SparkSpec {

  import spark.implicits._

  test("localMoranOnCells: a hot block core reads HH with positive I; " +
      "a lone spike in a cold field reads HL with negative I") {
    // 5x5 lattice: background 10; 2x2 hot block (100) at (0..1, 0..1);
    // lone spike (100) at (4,4) surrounded by background
    val cells = (for { a <- 0 to 4; b <- 0 to 4 } yield {
      val x = if ((a <= 1 && b <= 1) || (a == 4 && b == 4)) 100L else 10L
      (a, b, x)
    }).toDF("cell_lat", "cell_lon", "x")
    val out = SpatialJoin.localMoranOnCells(cells).collect()
      .map(r => (r.getAs[Int]("cell_lat"), r.getAs[Int]("cell_lon")) ->
        (r.getAs[Double]("local_i"), r.getAs[String]("quadrant"))).toMap
    // block core (0,0): hot self, hot neighbors -> HH, I > 0
    assert(out((0, 0))._2 == "HH" && out((0, 0))._1 > 0, s"${out((0, 0))}")
    // the lone spike: hot self, cold neighborhood -> HL, I < 0
    assert(out((4, 4))._2 == "HL" && out((4, 4))._1 < 0, s"${out((4, 4))}")
    // a far background cell with background neighbors: LL (below-mean
    // self, below-mean neighborhood)
    assert(out((2, 3))._2 == "LL", s"${out((2, 3))}")
  }

  test("amiLadder: a period-2 series carries ~ln2 of lag information; " +
      "pseudo-random noise carries ~none; gaps shrink the pair count") {
    def ev(vs: Seq[(Long, Double)]) = vs.zipWithIndex.map {
      case ((hr, v), i) => (i.toLong, hr * 3600L, "click", v)
    }.toDF("event_id", "s", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("s")).as("ts"),
        lit(1L).as("user_id"), col("event_type"), col("value"))
    val alt = (0L until 64L).map(h => (h, if (h % 2 == 0) 10.0 else 90.0))
    val a = Resample.amiLadder(ev(alt)).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("ami")).toMap
    // at the binned lo/hi level the next value is fully determined at
    // EVERY lag -> MI ≈ ln 2 ≈ 0.693 (quartile bins halve into lo/hi)
    assert(a(1) > 0.6 && a(2) > 0.6, s"$a")
    // a real bit-mixer: a LINEAR congruence (h*c % m) is a constant
    // rotation — x_{t+1} fully determines x_t and AMI reads ~max
    def noise(h: Long): Double =
      (math.abs(scala.util.hashing.MurmurHash3.stringHash(s"n$h"))
        % 997).toDouble / 10.0
    val rnd = (0L until 256L).map(h => (h, noise(h)))
    val b = Resample.amiLadder(ev(rnd)).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("ami")).toMap
    b.values.foreach(v => assert(v < 0.2, s"noise AMI: $b"))
    // gap-awareness: drop hour 10 -> lag-1 pairs lose BOTH (9,10) and
    // (10,11)
    val gappy = alt.filterNot(_._1 == 10L)
    val g = Resample.amiLadder(ev(gappy)).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Long]("n_pairs")).toMap
    assert(g(1) == 61L, s"$g") // 63 hours -> 62 adjacent, minus 2 + 1
  }

  test("q41_variant: typed variant extraction matches a hand rollup, " +
      "missing keys count as null") {
    val ev = Seq(
      (1L, "click", """{"k": 5}"""),
      (2L, "click", """{"k": 7}"""),
      (3L, "click", """{"other": 1}"""),
      (4L, "view", """{"k": 10}"""))
      .toDF("event_id", "event_type", "props")
      .select(col("event_id"), col("event_type"), col("props"),
        timestamp_seconds(col("event_id") * 60).as("ts"),
        lit(1L).as("user_id"), lit(1.0).as("value"))
    val out = ev.select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_missing"),
        sum("k").as("sum_k"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_missing"),
          r.getAs[Long]("sum_k"))).toMap
    assert(out("click") == ((3L, 1L, 12L)), s"$out")
    assert(out("view") == ((1L, 0L, 10L)), s"$out")
  }
}
