package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: operators must return empty/identity
  * results, not throw, on empty inputs (at 100 TB a partition or a whole
  * date-slice being empty is routine). */
class EdgeCaseSpec extends SparkSpec {

  private lazy val noEvents = Tables.events(spark, sf).filter(lit(false))
  private lazy val noDocs = Tables.documents(spark, sf).filter(lit(false))

  test("windows/sessionization on empty input") {
    assert(Windows.sessionNumbers(noEvents).count() == 0)
    assert(Windows.sessionSummary(noEvents).count() == 0)
    assert(Windows.rankAndLead(noEvents).count() == 0)
    assert(Windows.nestedFlattenRoundtrip(noEvents).count() == 0)
  }

  test("lambda pipeline on empty input") {
    assert(Lambda.alertClassify(noEvents).count() == 0)
    assert(Lambda.anomalies(noEvents).count() == 0)
    assert(Lambda.slidingWindowAgg(noEvents).count() == 0)
  }

  test("dedup/text on empty corpus") {
    val stats = Dedup.exactStats(noDocs).first()
    assert(stats.getAs[Long]("n_docs") == 0 && stats.getAs[Long]("n_dup_docs") == 0)
    assert(Dedup.ngramJaccardPairs(noDocs, 3, 0.2).count() == 0)
    assert(SketchDedup.minhashLshPairs(noDocs).count() == 0)
    assert(SketchDedup.simhashPairs(noDocs).count() == 0)
    assert(TextAnalysis.vocabulary(noDocs, 1, 10).count() == 0)
    assert(Dedup.dupClusters(Dedup.ngramJaccardPairs(noDocs, 3, 0.2)).count() == 0)
  }

  test("round-4 operators on empty input") {
    // SCD2 family: empty change stream → empty history; empty batch
    // applied to a history leaves it untouched
    assert(Dwh.scd2Build(noEvents, "user_id", "event_type", "ts", "event_id")
      .count() == 0)
    val hist = Dwh.scd2Build(Tables.events(spark, sf),
      "user_id", "event_type", "ts", "event_id")
    val applied = Dwh.scd2Apply(hist, noEvents,
      "user_id", "event_type", "ts", "event_id")
    assert(applied.exceptAll(hist).isEmpty && hist.exceptAll(applied).isEmpty)
    // CDC: empty changelog → snapshot passes through unchanged
    val snap = Tables.customer(spark, sf)
    val cdc = Dwh.cdcApply(snap,
      noEvents.select(col("user_id").as("c_custkey"),
        lit("U").as("op"), col("event_type").as("ns"), col("ts"),
        col("event_id").as("ord")),
      "c_custkey", "c_mktsegment", "op", "ns", "ts", "ord")
    assert(cdc.count() == snap.count())
    // sampling family
    assert(Sampling.mixtureSample(noDocs, "doc_id", "lang",
      Map("en" -> 1.0)).count() == 0)
    assert(Sampling.mixtureSample(Tables.documents(spark, sf), "doc_id",
      "lang", Map.empty[String, Double]).count() == 0)
    assert(Sampling.deterministicShuffle(noDocs, "doc_id").count() == 0)
    assert(Sampling.stratifiedFixed(noDocs, "doc_id", "lang", 5).count() == 0)
    // containment / mode / interval overlap
    assert(Dedup.ngramContainmentPairs(noDocs, 3, 0.5).count() == 0)
    assert(Stats.modePerGroup(noEvents, "event_type", "value").count() == 0)
    val noIv = noEvents.select(col("event_id").as("err_id"),
      unix_micros(col("ts")).as("s1"),
      (unix_micros(col("ts")) + 1L).as("e1"))
    val someIv = Tables.events(spark, sf).limit(5)
      .select(col("event_id").as("pur_id"), unix_micros(col("ts")).as("s2"),
        (unix_micros(col("ts")) + 1L).as("e2"))
    assert(RangeJoin.intervalOverlap(noIv, someIv,
      "s1", "e1", "s2", "e2", 1000000L).count() == 0)
    // semantic dedup over an empty vector set
    val cb = SimilaritySearch.ivfCodebook(Tables.embeddings(spark, sf), 4)
    assert(Dedup.semanticDedup(
      Tables.embeddings(spark, sf).filter(lit(false)), cb, 0.3).count() == 0)
  }

  test("asof join with empty right side yields null matches, keeps left") {
    val left = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(col("event_id").as("p"), col("user_id"), col("ts"))
    val emptyRight = Tables.events(spark, sf).filter(lit(false))
      .select(col("user_id"), col("ts"), col("event_id").as("c"))
    val out = AsOfJoin.asof(left, emptyRight, "user_id", "ts")
    assert(out.count() == left.count())
    assert(out.filter(col("matched").isNotNull).count() == 0)
  }

  test("null-text documents never pair as duplicates") {
    import spark.implicits._
    val docs = Seq((1L, null: String), (2L, null: String), (3L, "real text here"))
      .toDF("doc_id", "text")
    assert(SketchDedup.simhashPairs(docs).count() == 0,
      "two null-text docs must not become a hamming-0 pair")
    assert(SketchDedup.minhashLshPairs(docs).count() == 0)
  }

  test("ivf handles k larger than the corpus and nProbe larger than k") {
    import spark.implicits._
    val tiny = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // k > corpus clamps to the corpus size — no phantom cells
    val cb = SimilaritySearch.ivfCodebook(tiny, 8)
    assert(cb.size == 3)
    // nProbe > k clamps to k: probing every cell degrades to exact
    val all = SimilaritySearch.ivfTopK(tiny, 0L, 2, cb, nProbe = 100).collect()
    assert(all.map(_.getAs[Long]("vec_id")).toSet == Set(1L, 2L))
  }

  test("round-7 stats additions on empty/degenerate input") {
    // one-row aggregate ops: empty input must yield nulls/zeros, never
    // a DIVIDE_BY_ZERO or an empty frame the driver can't compare
    assert(Stats.kruskalWallis(noEvents, "event_type", "value")
      .collect().head.getAs[Long]("n") == 0L)
    assert(Stats.kendallTau(noEvents).collect().head
      .isNullAt(3)) // tau_b null when no hourly pairs exist
    assert(Stats.friedman(noEvents).collect().head.getAs[Long]("n") == 0L)
    assert(Stats.cliffsDelta(noEvents, "event_type", "value",
      "click", "view").collect().head.isNullAt(0))
    // per-time-row ops: empty in → empty out
    assert(Stats.kaplanMeier(noEvents).count() == 0)
    assert(Resample.backtestBaselines(noEvents).count() == 0)
    assert(TextAnalysis.naiveBayesLangEval(noDocs).count() == 0)
    // a single user / single hour: lifetimes and series of length one
    import spark.implicits._
    val one = Seq((1L, 0L)).toDF("user_id", "s")
      .select(col("user_id"), timestamp_seconds(col("s")).as("ts"))
    val km = Stats.kaplanMeier(one).collect()
    assert(km.length == 1 && km.head.getAs[Long]("n_risk") == 1L)
  }

  test("fifth-wave operators on empty input return empty/null, never throw") {
    // 1-row-out formulas: the row survives with null/zero aggregates
    assert(Stats.linCcc(noEvents).collect().head.isNullAt(1))
    assert(Stats.blandAltman(noEvents).count() == 1)
    assert(Stats.pairedTTest(noEvents).collect().head.getAs[Long]("n") == 0L)
    assert(Stats.partialCorr(noEvents).count() == 1)
    assert(Stats.cuped(noEvents).collect().head.getAs[Long]("n") == 0L)
    assert(Stats.sprt(noEvents).collect().head
      .getAs[String]("decision") == "continue")
    assert(Stats.metaAnalysis(noEvents).collect().head
      .getAs[Long]("k") == 0L)
    assert(Stats.captureRecapture(noEvents).collect().head
      .getAs[Long]("seen_total") == 0L)
    assert(Stats.overdispersion(noEvents).collect().head
      .getAs[Long]("n_days") == 0L)
    // per-row / per-group frames: empty in, empty out
    assert(Stats.mahalanobisOutliers(noEvents).count() == 0)
    assert(Resample.varianceRatio(noEvents).count() == 3)
    assert(Resample.saxWords(noEvents).count() == 0)
    assert(Resample.seasonalStrength(noEvents).count() == 0)
    assert(Windows.entropyRate(noEvents).count() == 1)
    assert(TextAnalysis.burrowsDelta(noDocs).count() == 0)
    assert(TextAnalysis.padEfficiency(noDocs).count() == 0)
    assert(TextAnalysis.liftTable(noDocs).count() == 0)
    assert(Quality.srmCheck(noEvents).count() == 1)
    // boxCox on empty: grid rows survive with null ll (ln of null var)
    assert(Stats.boxCoxScan(noEvents).count() == 6)
  }

  test("round-8 surfaces survive empty/degenerate inputs") {
    import spark.implicits._
    // empty corpus: frame-shaped no-ops, never crashes
    assert(Windows.intervalMerge(noEvents).count() == 0)
    assert(Windows.growthAccounting(noEvents).count() == 0)
    assert(Windows.cohortLtv(noEvents).count() == 0)
    assert(Resample.bollingerBands(noEvents).count() == 0)
    assert(Resample.kalmanLevel(noEvents, 0.5, 2.0).count() == 0)
    assert(Resample.garchVariance(noEvents, 1.0, 0.1, 0.8).count() == 0)
    assert(Quality.mixDrift(noEvents).count() == 0)
    assert(TextAnalysis.gopherRules(noDocs).count() == 0)
    assert(TextAnalysis.termBurstiness(noDocs).count() == 0)
    // 1-row aggregates on empty input: a row of nulls/zeros, not a crash
    assert(Stats.cramerVonMises(noEvents, "event_type", "value",
      "click", "view").count() == 1)
    assert(Stats.signTest(noEvents).count() == 1)
    assert(Stats.poissonTwoRate(noEvents).count() == 1)
    // single observation: recurrences seed without a second point
    val one = Seq((1L, 1000L, 5.0)).toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("value"))
    val k = Resample.kalmanLevel(one, 0.5, 2.0).collect().head
    assert(k.getAs[Double]("level") == 5.0 && k.getAs[Double]("gain") == 1.0)
    // single-hour series: no split candidate, still full coverage
    val oneHour = Seq((1L, 0L, "click", 5.0))
      .toDF("user_id", "s", "event_type", "value")
      .select(col("user_id"), timestamp_seconds(col("s")).as("ts"),
        col("event_type"), col("value"))
    assert(Resample.binarySegmentation(oneHour).count() <= 1)
    val grid = Resample.sesGrid(oneHour).collect()
    assert(grid.length == 9 && grid.forall(_.getAs[Double]("sse") == 0.0))
    // zero-error tie: smallest alpha flagged (total order)
    assert(grid.find(_.getAs[Boolean]("is_best"))
      .get.getAs[Double]("alpha") == 0.1)
  }

  test("short documents (< n tokens) produce no shingles but valid sketches") {
    import spark.implicits._
    val tiny = Seq((1L, "one two"), (2L, "a"), (3L, "")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    assert(Dedup.docShingles(tiny, 3).count() == 0)
    // row-local sketches still defined (degenerate signatures)
    assert(SketchDedup.withMinHashSignature(tiny).count() == 3)
    assert(SketchDedup.withSimHash(tiny).count() == 3)
  }
}
