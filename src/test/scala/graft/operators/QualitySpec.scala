package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {

  import spark.implicits._

  test("expectations: clean tables emit a stable all-zero report") {
    val li = graft.Tables.lineitem(spark, sf)
    val ord = graft.Tables.orders(spark, sf)
    val rep = Quality.expectations(li, ord).collect()
      .map(r => r.getAs[String]("check_name") -> r.getAs[Long]("n_violations"))
      .toMap
    assert(rep.keySet == Set("quantity_range", "nonpositive_price",
      "null_shipdate", "discount_range", "dup_pk", "orphan_orderkey"))
    // the synthetic lineitem is value-clean but its (orderkey, linenumber)
    // is NOT unique by construction — dup_pk must report exactly the
    // independently-counted surplus, every other check zero
    val expectedDups = li.groupBy("l_orderkey", "l_linenumber").count()
      .filter(col("count") > 1)
      .agg(coalesce(sum(col("count") - 1), lit(0L))).collect().head.getLong(0)
    assert(rep("dup_pk") == expectedDups)
    assert((rep - "dup_pk").values.forall(_ == 0L), s"clean data flagged: $rep")
  }

  test("expectations: seeded violations are counted exactly") {
    val li = Seq(
      // (orderkey, linenumber, quantity, price, discount, shipdate)
      (1L, 1, 10.0, 100.0, 0.05, "2024-01-01"),
      (1L, 1, 10.0, 100.0, 0.05, "2024-01-01"), // dup pk (+1 surplus)
      (2L, 1, -3.0, 100.0, 0.05, "2024-01-01"), // quantity out of range
      (3L, 1, 10.0, 0.0, 0.05, "2024-01-01"),   // nonpositive price
      (4L, 1, 10.0, 100.0, 1.5, null),          // bad discount + null date
      (99L, 1, 10.0, 100.0, 0.05, "2024-01-01") // orphan key
    ).toDF("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_shipdate")
    val ord = Seq(1L, 2L, 3L, 4L).toDF("o_orderkey")
    val rep = Quality.expectations(li, ord).collect()
      .map(r => r.getAs[String]("check_name") -> r.getAs[Long]("n_violations"))
      .toMap
    assert(rep == Map(
      "quantity_range" -> 1L, "nonpositive_price" -> 1L,
      "null_shipdate" -> 1L, "discount_range" -> 1L,
      "dup_pk" -> 1L, "orphan_orderkey" -> 1L))
  }

  test("drift: PSI is ~0 on an identical split, nonnegative always, large under a planted shift") {
    val ev = graft.Tables.events(spark, sf)
    // real split: PSI must be finite and >= 0 for every type (each term
    // (p-q)·ln(p/q) is sign-aligned)
    val real = Quality.drift(ev, "2024-01-16").collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val psi = r.getAs[Double]("psi")
      assert(!psi.isNaN && !psi.isInfinite && psi >= 0.0)
    }
    // identical distribution on both sides (same rows mirrored around the
    // split): PSI collapses to ~0 — smoothing keeps it tiny, not exact
    val sameBase = ev.filter(col("ts") < "2024-01-16")
      .select(col("ts"), col("event_type"), col("value"))
    val same = sameBase.unionByName(
      sameBase.select((col("ts") + expr("INTERVAL 31 DAYS")).as("ts"),
        col("event_type"), col("value")))
    Quality.drift(same, "2024-01-31").collect().foreach { r =>
      assert(r.getAs[Double]("psi") < 0.005, s"identical halves drifted: $r")
    }
    // planted shift: second half's values pushed up two bins
    val shiftedUp = sameBase.unionByName(
      sameBase.select((col("ts") + expr("INTERVAL 31 DAYS")).as("ts"),
        col("event_type"), (col("value") + 100.0).as("value")))
    val planted = Quality.drift(shiftedUp, "2024-01-31").collect()
    assert(planted.forall(_.getAs[Double]("psi") > 0.1),
      "a two-bin value shift must read as drift")
  }

  test("unigramCrossEntropy: exact on a hand corpus; rare-token docs score higher") {
    import spark.implicits._
    // corpus: "a a" + "b" → counts a:2 b:1, N=3, V=2
    // p(a)=(2+0.5)/(3+1)=0.625, p(b)=(1+0.5)/4=0.375
    val tiny = Seq((1L, "a a"), (2L, "b")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramCrossEntropy(tiny).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("ce"))).toMap
    assert(out(1L)._1 == 2 && out(2L)._1 == 1)
    assert(math.abs(out(1L)._2 - -math.log(0.625)) < 1e-6)
    assert(math.abs(out(2L)._2 - -math.log(0.375)) < 1e-6)
    assert(out(2L)._2 > out(1L)._2)
    // real corpus: every doc scored once, token counts match the cheap
    // counter, and a planted all-rare-tokens doc lands in the top tail
    val docs = graft.Tables.documents(spark, sf)
    val planted = docs.select("doc_id", "text").unionByName(
      Seq((999999L, "zzqx wvvk jjqz pplm zzqx")).toDF("doc_id", "text"))
    val scored = TextAnalysis.unigramCrossEntropy(planted).cache()
    assert(scored.count() == docs.count() + 1)
    val rareCe = scored.filter(col("doc_id") === 999999L)
      .head().getAs[Double]("ce")
    val maxRealCe = scored.filter(col("doc_id") =!= 999999L)
      .agg(max("ce")).head().getDouble(0)
    assert(rareCe > maxRealCe, "an all-novel-token doc must score highest")
    scored.unpersist()
  }

  test("bigramCrossEntropy: exact on a hand corpus; scrambled word salad scores higher") {
    import spark.implicits._
    // corpus: "a b" ×2 + "a c" → bigrams (a,b):2 (a,c):1; c1(a)=3; V=3
    // p(b|a)=(2+1)/(3+3)=0.5, p(c|a)=(1+1)/6=1/3
    val tiny = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramCrossEntropy(tiny).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("ce"))).toMap
    assert(out(1L)._1 == 1 && math.abs(out(1L)._2 - -math.log(0.5)) < 1e-6)
    assert(math.abs(out(3L)._2 - -math.log(1.0 / 3.0)) < 1e-6)
    // a one-token doc has no bigrams and drops (mirrors the oracle)
    assert(!TextAnalysis.bigramCrossEntropy(
      tiny.unionByName(Seq((4L, "a")).toDF("doc_id", "text")))
      .collect().map(_.getLong(0)).contains(4L))
    // the context signal unigram CE cannot see: both probe docs use the
    // SAME words at the SAME frequencies, only the order differs — the
    // with-the-grain doc ("x y" dominates the corpus) must beat the
    // against-the-grain one. Hand values: p(y|x)=54/55, p(x|y)=4/5
    val planted = (Seq.tabulate(50)(i => (i.toLong, "x y")) ++
      Seq((777L, "x y x y"), (778L, "y x y x"))).toDF("doc_id", "text")
    val scored = TextAnalysis.bigramCrossEntropy(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ce")).toMap
    val expA = -(2 * math.log(54.0 / 55) + math.log(4.0 / 5)) / 3
    val expB = -(2 * math.log(4.0 / 5) + math.log(54.0 / 55)) / 3
    assert(math.abs(scored(777L) - expA) < 1e-4)
    assert(math.abs(scored(778L) - expB) < 1e-4)
    assert(scored(778L) > scored(777L),
      "same words, rarer order must score higher")
    // full-corpus coverage: every >=2-token doc scores exactly once
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    assert(TextAnalysis.bigramCrossEntropy(docs).count() ==
      docs.filter(size(split(col("text"), " ")) >= 2).count())
  }

  test("dpNoisyCounts: noise bounded by the Laplace tail, sticky per tag, fresh per tag") {
    val events = graft.Tables.events(spark, sf)
    val truth = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rel = Quality.dpNoisyCounts(events, "event_type").collect()
    assert(rel.length == truth.size)
    // hash-uniform u keeps 2|u-1/2| <= 1 - 1/65536, so |noise| is capped
    // at (1/eps)·ln(65536) ≈ 22.2 — the release is usefully close
    val cap = (1.0 / 0.5) * math.log(65536.0)
    rel.foreach { r =>
      val g = r.getString(0)
      assert(math.abs(r.getDouble(1) - truth(g)) <= cap,
        s"$g: noisy ${r.getDouble(1)} vs true ${truth(g)}")
      assert(r.getDouble(2) == 0.5)
    }
    // sticky noise: replaying the same release tag re-derives identical
    // noise (no budget re-spend); a new tag draws fresh noise
    val again = Quality.dpNoisyCounts(events, "event_type").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rel.map(r => r.getString(0) -> r.getDouble(1)).toMap == again)
    val fresh = Quality.dpNoisyCounts(events, "event_type",
      releaseTag = "r2").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rel.exists(r => fresh(r.getString(0)) != r.getDouble(1)),
      "a new release tag must draw different noise")
    // tiny groups can't go negative: the release clamps at zero
    import spark.implicits._
    val tiny = Seq.fill(1)("only").toDF("event_type")
    Quality.dpNoisyCounts(tiny, "event_type", releaseTag = "r3").collect()
      .foreach(r => assert(r.getDouble(1) >= 0.0))
  }

  test("perplexityBands: ppl = exp(ce); tertile bands ordered and near-equal-sized") {
    val banded = TextAnalysis.perplexityBands(
      graft.Tables.documents(spark, sf)).cache()
    val rows = banded.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("ppl") -
        math.exp(r.getAs[Double]("ce"))) < 1e-3)
    }
    val byBand = rows.groupBy(_.getAs[String]("band"))
      .view.mapValues(_.map(_.getAs[Double]("ce"))).toMap
    assert(byBand.keySet == Set("head", "middle", "tail"))
    // bands partition the CE axis: max(head) <= min(middle) <= ... tail
    assert(byBand("head").max <= byBand("middle").min)
    assert(byBand("middle").max <= byBand("tail").min)
    // tertile banding: each band holds a third of the corpus ±2
    val n = rows.length
    byBand.values.foreach(b =>
      assert(math.abs(b.length - n / 3.0) <= 2.0,
        s"band sizes ${byBand.view.mapValues(_.length).toMap} vs n=$n"))
    banded.unpersist()
  }

  test("freshness: planted lags and null payloads are reported exactly") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // "click" is the corpus high-water mark (2 days, one null value)
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", Some(1.0), "{}"),
      (2L, ts("2024-01-03 09:30:00"), 7L, "click", None, "{}"),
      // "view" trails by 25.5h -> 25 whole hours behind, 1 active day
      (3L, ts("2024-01-02 08:00:00"), 8L, "view", Some(2.0), "{}"),
      (4L, ts("2024-01-02 07:00:00"), 8L, "view", Some(3.0), "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rep = Quality.freshness(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("active_days"),
          r.getAs[Long]("hours_behind"),
          r.getAs[Double]("null_value_frac")))).toMap
    assert(rep("click") == ((2L, 2L, 0L, 0.5)))
    assert(rep("view") == ((2L, 1L, 25L, 0.0)))
  }

  test("schemaDrift classifies added/removed/type-changed/unchanged columns") {
    import spark.implicits._
    val old = Seq((1L, "a", 1.0)).toDF("id", "keep", "v")
    val neu = Seq((1L, "a", "x", true)).toDF("id", "keep", "v", "extra")
      .withColumn("v", col("v").cast("string"))
    val got = Quality.schemaDrift(old, neu).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[String]("status")).toMap
    assert(got == Map("id" -> "unchanged", "keep" -> "unchanged",
      "v" -> "type_changed", "extra" -> "added"))
    val gotRev = Quality.schemaDrift(neu, old).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[String]("status")).toMap
    assert(gotRev("extra") == "removed")
  }

  test("completeness reports exact null counts per column in one pass") {
    import spark.implicits._
    val df = Seq(
      (Some(1), Some("a")), (None, Some("b")), (Some(3), None), (None, None)
    ).toDF("x", "y")
    val rep = Quality.completeness(df, Seq("x", "y")).collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_total"), r.getAs[Long]("n_null"),
          r.getAs[Double]("null_rate")))).toMap
    assert(rep("x") == ((4L, 2L, 0.5)))
    assert(rep("y") == ((4L, 2L, 0.5)))
  }

  test("referentialIntegrity counts planted orphans, null FKs, dup parent keys") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 2L, 3L).toDF("pk")             // 2 is duplicated
    val child = Seq(Some(1L), Some(4L), None).toDF("fk")    // 4 is an orphan
    val r = Quality.referentialIntegrity("child->parent",
      child, "fk", parent, "pk").collect().head
    assert(r.getAs[String]("relation") == "child->parent")
    assert(r.getAs[Long]("n_child_rows") == 3L)
    assert(r.getAs[Long]("n_null_fk") == 1L, "null FK is not an orphan")
    assert(r.getAs[Long]("n_orphans") == 1L)
    assert(r.getAs[Long]("n_parent_keys") == 3L)
    assert(r.getAs[Long]("n_dup_parent_keys") == 1L)
  }

  test("uniqueness audits single and composite keys across entities") {
    import spark.implicits._
    val single = Seq(1L, 1L, 2L).toDF("k")
    val comp = Seq((1L, 1L), (1L, 2L), (1L, 2L)).toDF("k1", "k2")
    val rows = Quality.uniqueness(Seq(
      ("single", single, Seq("k")),
      ("comp", comp, Seq("k1", "k2")))).collect()
      .map(r => r.getAs[String]("entity") -> r).toMap
    assert(rows("single").getAs[String]("key_cols") == "k")
    assert(rows("single").getAs[Long]("n_rows") == 3L)
    assert(rows("single").getAs[Long]("n_keys") == 2L)
    assert(rows("single").getAs[Long]("dup_rows") == 1L)
    // composite key distinguishes (1,1) from (1,2): 2 keys, 1 dup row
    assert(rows("comp").getAs[String]("key_cols") == "k1,k2")
    assert(rows("comp").getAs[Long]("n_keys") == 2L)
    assert(rows("comp").getAs[Long]("dup_rows") == 1L)
  }

  test("observedProfile piggybacks the exact metrics of a direct aggregate") {
    import spark.implicits._
    val ev = Seq(Some(1.25), None, Some(3.75), Some(-0.5))
      .toDF("value")
    val r = Quality.observedProfile(ev).collect().head
    assert(r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[Long]("null_values") == 1L)
    assert(r.getAs[Double]("min_value") == -0.5)
    assert(r.getAs[Double]("max_value") == 3.75)
    assert(r.getAs[Double]("sum_value") == 4.5)
  }

  test("kAnonymity counts exactly the under-k groups and their rows") {
    import spark.implicits._
    // groups: (a,1)x6, (a,2)x3, (b,1)x1 → k-level 1; below 5: two
    // groups carrying 3+1 = 4 rows
    val df = (Seq.fill(6)(("a", 1)) ++ Seq.fill(3)(("a", 2)) ++
      Seq(("b", 1))).toDF("q1", "q2")
    val r = Quality.kAnonymity(df, Seq(col("q1"), col("q2")), k = 5)
      .collect().head
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("anonymity_k") == 1L)
    assert(r.getAs[Long]("groups_below_k") == 2L)
    assert(r.getAs[Long]("rows_at_risk") == 4L)
    // a fully k-anonymous frame reports zero risk
    val ok = Seq.fill(10)(("a", 1)).toDF("q1", "q2")
    val r2 = Quality.kAnonymity(ok, Seq(col("q1"), col("q2")), k = 5)
      .collect().head
    assert(r2.getAs[Long]("groups_below_k") == 0L &&
      r2.getAs[Long]("rows_at_risk") == 0L)
  }

  test("datasetCard: hand-checked metrics on a planted corpus") {
    val docs = Seq(
      (1L, "a b c", "en"), (2L, "a b c", "en"), // exact dup pair
      (3L, "x y", "fr"), (4L, "z", "fr"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val card = Quality.datasetCard(docs).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Double]("value"))
      .toMap
    assert(card("n_docs") == 4.0 && card("n_unique_texts") == 3.0)
    assert(card("exact_dup_rate") == 0.25)
    assert(card("total_ws_tokens") == 9.0) // 3+3+2+1
    assert(card("mean_ws_tokens") == 2.25)
    assert(card("docs_lang_en") == 2.0 && card("docs_lang_fr") == 2.0)
    // two equally-sized languages: entropy is exactly ln 2
    assert(card("lang_entropy") == 0.693147)
    assert(card("p50_chars") == 4.0) // chars 5,5,3,1 → median 4
  }

  test("planMetrics reports the row waterfall of the executed plan") {
    val df = spark.range(100).toDF("id")
      .filter(col("id") >= 50)
      .groupBy((col("id") % 2).as("k")).agg(count(lit(1)).as("n"))
    val m = Quality.planMetrics(df).collect()
      .map(r => (r.getAs[Long]("ord"), r.getAs[Int]("depth"),
        r.getAs[String]("op"), r.getAs[Long]("rows")))
    // pre-order: ord strictly increasing from 0
    assert(m.map(_._1).toSeq == m.indices.map(_.toLong))
    // the scan emits all 100 ids, the filter halves them
    assert(m.exists(t => t._3.contains("Range") && t._4 == 100L),
      s"missing Range(100) in:\n${m.mkString("\n")}")
    assert(m.exists(t => t._3.contains("Filter") && t._4 == 50L),
      s"missing Filter(50) in:\n${m.mkString("\n")}")
    // the FINAL aggregate (shallowest HashAggregate) emits the 2 groups
    val aggs = m.filter(_._3.contains("HashAggregate"))
    assert(aggs.nonEmpty && aggs.minBy(_._2)._4 == 2L,
      s"final agg must emit 2 groups:\n${aggs.mkString("\n")}")
    // a FRESH build of the same query reports the same waterfall
    // (the report contract: one fresh frame, one report — metrics on a
    // reused instance are cumulative/stage-cached by Spark)
    val df2 = spark.range(100).toDF("id")
      .filter(col("id") >= 50)
      .groupBy((col("id") % 2).as("k")).agg(count(lit(1)).as("n"))
    val again = Quality.planMetrics(df2).collect()
      .map(r => (r.getAs[String]("op"), r.getAs[Long]("rows"))).toSeq
    assert(again == m.map(t => (t._3, t._4)).toSeq)
  }

  test("naiveBayesLangEval: diagonal confusion on a separable planted corpus") {
    // two langs with disjoint vocabularies; md5 split assigns both
    // train and test docs to each class for these 40 ids
    val docs = (1 to 40).map { i =>
      if (i % 2 == 0) (i.toLong, "aa", "foo bar baz foo qux")
      else (i.toLong, "bb", "uno dos tres uno cinco")
    }.toDF("doc_id", "lang", "text")
    val cm = TextAnalysis.naiveBayesLangEval(docs).collect()
    assert(cm.nonEmpty, "the hash split must leave held-out docs")
    cm.foreach { r =>
      assert(r.getAs[String]("true_lang") == r.getAs[String]("pred_lang"),
        s"separable vocabularies must classify perfectly: $r")
    }
    // deterministic: integer scores admit no partition-order flaps
    val again = TextAnalysis.naiveBayesLangEval(docs).collect()
    assert(cm.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
    // unseen tokens at score time must not error or bias: a test-only
    // token falls back to the per-class unseen mass for EVERY class
    val withNoise = docs.union(
      Seq((41L, "aa", "zzz foo bar")).toDF("doc_id", "lang", "text"))
    val cm2 = TextAnalysis.naiveBayesLangEval(withNoise).collect()
    cm2.foreach { r =>
      assert(r.getAs[String]("true_lang") == r.getAs[String]("pred_lang"))
    }
  }

  test("hourCoverage: the punched-out hours are counted and the first is pinpointed") {
    import spark.implicits._
    // 48-hour span with hours 10 and 20 empty
    val ev = (0 until 48).filter(h => h != 10 && h != 20)
      .map(h => (h.toLong * 3600L, "click"))
      .toDF("s", "event_type")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"))
    val r = Quality.hourCoverage(ev).collect().head
    assert(r.getAs[Long]("n_expected") == 48L &&
      r.getAs[Long]("n_observed") == 46L &&
      r.getAs[Long]("n_missing") == 2L, s"$r")
    assert(r.getAs[Long]("first_missing_hr") == 10L)
    assert(r.getAs[Double]("coverage") ==
      math.floor(46.0 / 48 * 1e6 + 0.5) / 1e6)
  }

  test("volumeAnomaly: the double-load day is flagged, normal jitter is not") {
    import spark.implicits._
    // 14 days of 100±2 rows, day 8 carries a replayed double load
    val ev = (1 to 14).flatMap { d =>
      val n = if (d == 8) 200 else 100 + (d % 3) - 1
      (0 until n).map(i => (d, i))
    }.toDF("d", "i")
      .select(expr("make_timestamp(2024, 1, d, 0, 0, 0)").as("ts"))
    val out = Quality.volumeAnomaly(ev).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Long]("n"), r.getAs[Boolean]("flagged")))).toMap
    assert(out.size == 14)
    assert(out("2024-01-08") == ((200L, true)),
      s"the replay day must flag: $out")
    assert(out.filter(_._1 != "2024-01-08").values.forall(!_._2),
      s"jitter days must pass: $out")
  }

  test("vocabularyRichness: closed vocab estimates itself; singleton-heavy corpus inflates Chao1") {
    import spark.implicits._
    // every type seen many times: no singletons → missing mass 0 and
    // Chao1 = observed vocab exactly (nothing left to discover)
    val closed = (0 until 20).map(i =>
      (i.toLong, Seq.fill(10)(s"w${i % 5}").mkString(" ")))
      .toDF("doc_id", "text")
    val c = TextAnalysis.vocabularyRichness(closed).collect().head
    assert(c.getAs[Long]("vocab") == 5L &&
      c.getAs[Double]("missing_mass") == 0.0 &&
      c.getAs[Double]("chao1") == 5.0, s"$c")
    // all singletons: the unseen tail dwarfs the observed vocab
    val open = (0 until 100).map(i => (i.toLong, s"unique$i"))
      .toDF("doc_id", "text")
    val o = TextAnalysis.vocabularyRichness(open).collect().head
    assert(o.getAs[Long]("n_hapax") == 100L &&
      o.getAs[Double]("missing_mass") == 1.0)
    assert(o.getAs[Double]("chao1") == 100 + 100.0 * 99 / 2,
      s"all-singleton Chao1 is the bias-corrected closed form: $o")
  }

  test("liftTable: score-aligned class doubles top-decile lift; cum_lift ends at 1") {
    import spark.implicits._
    // stopword share i/100 makes quality STRICTLY monotone in id (the
    // letters-ratio term also rises with it, the length term is
    // constant); ids 50..99 are 'en' → top half pure positive
    val docs = (0 until 100).map { i =>
      val text = (Seq.fill(i)("the") ++ Seq.fill(100 - i)("zz"))
        .mkString(" ")
      (i.toLong, if (i >= 50) "en" else "de", text)
    }.toDF("doc_id", "lang", "text")
    val out = TextAnalysis.liftTable(docs).collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("n_pos"), r.getAs[Double]("lift"),
          r.getAs[Double]("cum_lift")))).toMap
    assert(out.size == 10)
    (1 to 5).foreach(d => assert(out(d) == ((10L, 2.0, 2.0)),
      s"pure-positive decile $d: ${out(d)}"))
    (6 to 10).foreach(d => assert(out(d)._1 == 0L && out(d)._2 == 0.0))
    assert(out(10)._3 == 1.0, "pooling everything must land at base rate")
  }

  test("srmCheck: md5-split ids pass; an arm-biased id set trips the gate") {
    import spark.implicits._
    // the md5Arm rule: first hex digit < '8' (high bit of the first
    // nibble) → arm A — must match Stats.md5Arm exactly
    def armOf(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) 0 else 1
    }
    def ev(ids: Seq[Long]) = ids.map(i => (i, "click", 1.0))
      .toDF("user_id", "event_type", "value")
    val ok = Quality.srmCheck(ev(0L until 1000L)).collect().head
    assert(ok.getAs[Long]("n_a") + ok.getAs[Long]("n_b") == 1000L)
    assert(!ok.getAs[Boolean]("srm_flag"),
      s"an honest hash split must pass: $ok")
    // hand-pick 190 arm-0 ids and 10 arm-1 ids: chi2 = 180²/200 = 162
    val biased = (0L until 10000L).filter(armOf(_) == 0).take(190) ++
      (0L until 10000L).filter(armOf(_) == 1).take(10)
    val bad = Quality.srmCheck(ev(biased)).collect().head
    assert(bad.getAs[Long]("n_a") == 190L && bad.getAs[Long]("n_b") == 10L,
      s"test harness must agree with the engine's arm hash: $bad")
    assert(bad.getAs[Boolean]("srm_flag") &&
      bad.getAs[Double]("chi2") == 162.0, s"$bad")
  }

  test("isotonicCalibration: violators pool to the weighted average; output monotone") {
    import spark.implicits._
    // bins 1..4 get 10 rows each with 2, 5, 4, 7 positives: bins 2,3
    // violate (0.5 > 0.4) and must pool to 9/20 = 0.45
    val rows = for {
      (bin, pos) <- Seq((1, 2), (2, 5), (3, 4), (4, 7))
      i <- 0 until 10
    } yield (bin / 10.0 + 0.05, if (i < pos) 1 else 0)
    val out = Stats.isotonicCalibration(rows.toDF("score", "y"),
      col("score"), col("y")).collect()
      .map(r => r.getAs[Int]("bin") ->
        (r.getAs[Double]("frac_pos"), r.getAs[Double]("iso_frac")))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1, 2, 3, 4))
    assert(out.map(_._2._1).toSeq == Seq(0.2, 0.5, 0.4, 0.7))
    assert(out.map(_._2._2).toSeq == Seq(0.2, 0.45, 0.45, 0.7),
      s"violating pair must pool: ${out.toSeq}")
    assert(out.map(_._2._2).sliding(2).forall(p => p(0) <= p(1)))
    // a fully monotone curve is a fixpoint
    val mono = for {
      (bin, pos) <- Seq((1, 1), (2, 4), (3, 8))
      i <- 0 until 10
    } yield (bin / 10.0 + 0.05, if (i < pos) 1 else 0)
    val fix = Stats.isotonicCalibration(mono.toDF("score", "y"),
      col("score"), col("y")).collect()
    assert(fix.forall(r =>
      r.getAs[Double]("frac_pos") == r.getAs[Double]("iso_frac")))
  }

  test("adUniformity: honest ids pass; a tail-starved id set trips the tail-weighted gate") {
    import spark.implicits._
    def ev(ids: Seq[Long]) = ids.map(i => (i, "click", 1.0))
      .toDF("user_id", "event_type", "value")
    def uOf(id: Long): Double =
      ((id * 2654435761L) % 4294967296L + 0.5) / 4294967296.0
    val ok = Quality.adUniformity(ev(0L until 2000L)).collect().head
    assert(ok.getAs[Boolean]("uniform_ok"), s"honest hash must pass: $ok")
    // keys whose hash lands only in the middle half: the ECDF matches
    // uniform loosely in the bulk but the empty tails are exactly what
    // AD's ln-weights punish
    val mid = (0L until 100000L).iterator
      .filter(i => { val u = uOf(i); u > 0.25 && u < 0.75 })
      .take(2000).toSeq
    val bad = Quality.adUniformity(ev(mid)).collect().head
    assert(!bad.getAs[Boolean]("uniform_ok"), s"starved tails must trip: $bad")
    assert(bad.getAs[Double]("a2") > ok.getAs[Double]("a2"))
  }

  test("padEfficiency: exact-fit buckets waste 0; the baseline charges the global max") {
    import spark.implicits._
    // 4 docs of exactly 32 tokens (zero waste in the 32-bucket) and
    // 1 doc of 33 (lands in 64): waste = 1 − 33/64
    def text(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = ((0 until 4).map(i => (i.toLong, "s", text(32))) :+
      ((9L, "s", text(33)))).toDF("doc_id", "source", "text")
    val out = TextAnalysis.padEfficiency(docs).collect()
      .map(r => r.getAs[Long]("bucket_cap") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("padding_waste"),
          r.getAs[Double]("unbucketed_waste")))).toMap
    val base = 1.0 - (4 * 32 + 33).toDouble / (5 * 33)
    assert(out(32L)._1 == 4L && out(32L)._2 == 0.0, s"$out")
    assert(out(64L)._1 == 1L &&
      math.abs(out(64L)._2 - (1.0 - 33.0 / 64)) < 1e-6)
    assert(out.values.forall(v => math.abs(v._3 - base) < 1e-6),
      s"baseline must pad every doc to the global max: $out vs $base")
  }

  test("padEfficiency: overflow docs get their own true-max cap, never negative waste") {
    import spark.implicits._
    def text(n: Int) = Seq.fill(n)("w").mkString(" ")
    // 5000-token doc exceeds the 4096 cap: it must land in an overflow
    // bucket capped at its own length (waste 0), not report
    // max_tokens > cap with negative waste
    val docs = Seq((0L, "s", text(10)), (1L, "s", text(5000)),
      (2L, "s", text(4500))).toDF("doc_id", "source", "text")
    val out = TextAnalysis.padEfficiency(docs).collect()
      .map(r => r.getAs[Long]("bucket_cap") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("padding_waste"))).toMap
    // the overflow bucket's cap IS the true max length of its docs
    assert(out.contains(5000L), s"overflow bucket missing: $out")
    assert(out(5000L)._1 == 2L)
    assert(math.abs(out(5000L)._2 - (1.0 - 9500.0 / 10000)) < 1e-6)
    assert(out.values.forall(_._2 >= 0.0), s"negative waste: $out")
  }

  test("readability: hand-computed Flesch on a two-sentence doc; bands split") {
    import spark.implicits._
    // "The cat sat. The dog ran!": 6 ws-words, 2 sentence marks,
    // 6 vowel groups → 206.835 − 1.015·3 − 84.6·1 = 119.19 (easy)
    val docs = Seq(
      (0L, "s1", "The cat sat. The dog ran!"),
      // long unpunctuated word soup: 1 forced sentence, syllable-heavy
      (1L, "s2", Seq.fill(40)("onomatopoeia").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.readability(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(math.abs(out("s1").getAs[Double]("avg_flesch") - 119.19) < 1e-6)
    assert(out("s1").getAs[Long]("n_easy") == 1L)
    // 40 words / 1 sentence, 6 vowel groups per word → deeply negative
    assert(out("s2").getAs[Double]("avg_flesch") < 0)
    assert(out("s2").getAs[Long]("n_difficult") == 1L)
  }

  test("burrowsDelta: same-template sources are closest; style outlier sits far") {
    import spark.implicits._
    // A and B share function-word style; C leans on a different one.
    // Topic words (cat/dog/bird) differ everywhere — delta must see
    // through topic to the function-word rates.
    def docs(src: String, filler: String, topic: String) =
      (0 until 10).map(i =>
        (s"$src-$i", src, s"$filler $topic $filler is $filler $topic $i"))
    val corpus = (docs("A", "the", "cat") ++ docs("B", "the", "dog") ++
      docs("C", "of", "bird"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.burrowsDelta(corpus, topWords = 8, topPairs = 3)
      .collect()
      .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"),
        r.getAs[Double]("delta")))
    assert((out.head._1, out.head._2) == (("A", "B")),
      s"shared style must rank closest: ${out.toSeq}")
    assert(out.head._3 < out.tail.head._3,
      s"the style outlier must sit strictly farther: ${out.toSeq}")
  }

  test("fdCheck: true FD reports zero violations; dirty FD counts exactly") {
    val df = Seq(
      (1L, 10L, "a"), (1L, 10L, "a"), // group 1: consistent
      (2L, 20L, "a"), (2L, 21L, "b"), // group 2: violates k->v
      (3L, 30L, "a"))
      .toDF("k", "v", "w")
    val out = Quality.fdCheck(Seq(
      ("k->v", df, Seq("k"), "v"),
      ("k,v->w", df, Seq("k", "v"), "w"))).collect()
      .map(r => r.getAs[String]("fd") ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("n_violating"),
          r.getAs[Boolean]("holds"))).toMap
    assert(out("k->v") == ((3L, 1L, false)))
    assert(out("k,v->w") == ((4L, 0L, true)))
  }

  test("knCrossEntropy: hand KN probability on a planted split; oov counted not scored") {
    // replicate the operator's md5 split to PLANT one train and one
    // test doc deterministically
    def isTrain(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"kn$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      hex.substring(0, 2) < "cd"
    }
    val trainId = (1L to 200L).find(isTrain).get
    val testId = (1L to 200L).find(!isTrain(_)).get
    val docs = Seq(
      (trainId, "s0", "x y x y x"),  // train: c(xy)=2, c(yx)=2
      (testId, "s0", "x y x z"))     // test: xy, yx seen; zw unseen → oov
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.knCrossEntropy(docs).collect().head
    assert(r.getAs[Long]("n_bigrams") == 2L && r.getAs[Long]("n_oov") == 1L)
    // P(y|x) = P(x|y) = (2−.75)/2 + .75·(1/2)·(1/2) = 0.8125 →
    // ce = round(-ln(0.8125)·1e6)/1e6 for both scored bigrams
    val t = math.rint(-math.log(0.8125) * 1e6)
    val ce = BigDecimal(2 * t / 1e6 / 2).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("ce") == ce, s"${r.getAs[Double]("ce")} vs $ce")
    // real corpus: one row per source, all finite positive CE
    val real = TextAnalysis.knCrossEntropy(
      graft.Tables.documents(spark, sf)).collect()
    assert(real.nonEmpty && real.forall(_.getAs[Double]("ce") > 0))
  }

  test("textRank: the co-occurrence hub outranks spokes; tail words are gated") {
    // 'hub' neighbors every spoke; each spoke only meets the hub;
    // 'rare' stays under the frequency gate and never enters the graph
    val docs = (1 to 30).map(i =>
      (i.toLong, "hub w1 hub w2 hub w3" +
        (if (i == 1) " rare" else "")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.textRank(docs, minCount = 10).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Double]("rank"))
    assert(out.map(_._1).toSet == Set("hub", "w1", "w2", "w3"),
      s"gated vocabulary only: ${out.toSeq}")
    assert(out.head._1 == "hub", "the hub must rank first")
    val spokes = out.filter(_._1 != "hub").map(_._2)
    assert(spokes.toSet.size == 1, "symmetric spokes must tie exactly")
    assert(out.head._2 > spokes.head)
  }

  test("termBurstiness: concentrated term outranks the evenly spread one") {
    // 'bursty': 10x in each of 20 docs → tf/df = 10;
    // 'common': once in each of 25 docs → 1; 'rare' df 5 < minDf cut
    val docs = ((1 to 20).map(i =>
      (i.toLong, (1 to 10).map(_ => "bursty").mkString(" ") + " common")) ++
      (21 to 25).map(i => (i.toLong, "common rare")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.termBurstiness(docs).collect()
      .map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("df"), r.getAs[Long]("tf_total"),
          r.getAs[Double]("burstiness")))
    assert(out.map(_._1).toSeq == Seq("bursty", "common"),
      s"rare must be cut by minDf: ${out.toSeq}")
    assert(out.head._2 == ((20L, 200L, 10.0)))
    assert(out.last._2 == ((25L, 25L, 1.0)))
  }

  test("hashUniformity: singleton D is its own u; 1k sequential keys pass") {
    def ev(ids: Long*) = ids.toDF("user_id")
    // one key: ECDF jumps 0→1 at u ≈ 0.618..., D = u itself
    val u1 = (1L * 2654435761L % 4294967296L) / 4294967296.0
    val one = Quality.hashUniformity(ev(1L)).collect().head
    assert(one.getAs[Long]("n_keys") == 1L)
    assert(one.getAs[Double]("d_stat") ==
      BigDecimal(math.max(u1, 1 - u1)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // sequential ids — the common worst case for weak hashes — spread
    // cleanly under the multiplicative hash
    val seq = Quality.hashUniformity(ev((1L to 1000L): _*)).collect().head
    assert(seq.getAs[Boolean]("uniform_ok") &&
      seq.getAs[Double]("d_stat") < 0.05, s"$seq")
  }

  test("mixDrift: identical mixes score 0, disjoint mixes score 1, first week skipped") {
    // Mondays 1970-01-05 / -12 / -19: w2 repeats w1's mix, w3 flips
    // to a type neither earlier week had
    def wk(day: String, types: Seq[String]) = types.zipWithIndex.map {
      case (t, i) => (i.toLong, day, t)
    }
    val ev = (wk("1970-01-05", Seq("a", "a", "b", "b")) ++
      wk("1970-01-12", Seq("a", "a", "b", "b")) ++
      wk("1970-01-19", Seq("c", "c", "c", "c")))
      .toDF("user_id", "d", "event_type")
      .select(col("user_id"), to_timestamp(col("d")).as("ts"),
        col("event_type"))
    val out = Quality.mixDrift(ev).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Double]("jsd")).toMap
    assert(out.keySet == Set("1970-01-12", "1970-01-19"),
      s"first week has no baseline: $out")
    assert(out("1970-01-12") == 0.0)
    assert(out("1970-01-19") == 1.0, "disjoint supports saturate JSD")
  }

  test("killReport: unique kills attributed per rule; double-failure is nobody's unique") {
    val mk50 = (1 to 50).map(_ => "word").mkString(" ")
    val docs = Seq(
      (1L, mk50),                                   // clean
      (2L, "too short"),                            // fails word_count only
      (3L, (1 to 50).map(_ => "ab").mkString(" ")),  // fails mean_len only
      (6L, mk50 + " " + "x" * 30),                  // fails longest only
      (7L, "a 9"))                    // fails word_count AND alpha AND len
      .toDF("doc_id", "text")
    val out = TextAnalysis.killReport(docs).collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_failing"), r.getAs[Long]("n_unique_kill")))
      .toMap
    assert(out.keySet ==
      Set("word_count", "mean_len", "alpha", "longest"))
    assert(out("word_count") == ((2L, 1L))) // doc2 unique, doc7 shared
    assert(out("mean_len")._2 == 1L)        // doc3
    assert(out("longest") == ((1L, 1L)))    // doc6
    assert(out("alpha")._2 == 0L, "doc7's alpha failure is shared")
    val rows = TextAnalysis.killReport(docs).collect()
    assert(rows.forall(r => r.getAs[Long]("n_docs") == 5L &&
      r.getAs[Long]("n_kept") == 1L))
  }

  test("gopherRules: each rule gate trips independently; clean doc keeps") {
    val mk50 = (1 to 50).map(_ => "word").mkString(" ")
    val docs = Seq(
      (1L, mk50),                                  // clean: keep
      (2L, "too short"),                           // word count
      (3L, (1 to 50).map(_ => "ab").mkString(" ")), // mean len 2 < 3
      (4L, ((1 to 45).map(_ => "word") ++
        (1 to 5).map(_ => "1234")).mkString(" ")),  // alpha 0.9 keeps
      (5L, ((1 to 40).map(_ => "word") ++
        (1 to 10).map(_ => "99x")).mkString(" ")),  // alpha 0.8 boundary
      (6L, (mk50 + " " + "x" * 30)))               // longest 30 > 25
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("pass_word_count") &&
      !out(2L).getAs[Boolean]("keep"))
    assert(!out(3L).getAs[Boolean]("pass_mean_len"))
    assert(out(4L).getAs[Boolean]("pass_alpha") &&
      out(4L).getAs[Double]("alpha_word_frac") == 0.9)
    assert(out(5L).getAs[Boolean]("pass_alpha"), "0.8 is inclusive")
    assert(!out(6L).getAs[Boolean]("pass_longest") &&
      out(6L).getAs[Long]("longest_word") == 30L)
  }

  test("trigramNovelty: a verbatim repeat scores 0, fresh text scores " +
      "1, and sub-trigram docs drop") {
    import spark.implicits._
    // d0 coins both trigrams; d1 repeats them verbatim; d2 is fresh;
    // d3 (two tokens) has no trigrams and must vanish, not crash
    val docs = Seq((0L, "a b c d"), (1L, "a b c d"), (2L, "x y z"),
      (3L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.trigramNovelty(docs).collect()
      .map(r => (r.getAs[Long]("decile"),
        (r.getAs[Long]("n_docs"), r.getAs[Double]("novelty")))).toMap
    // n = 4 docs: deciles 0, 2, 5 for d0..d2 (d3 dropped)
    assert(out == Map(0L -> (1L, 1.0), 2L -> (1L, 0.0),
      5L -> (1L, 1.0)), s"$out")
  }

  test("vocabCoverage: the budget ladder prices exact occurrence " +
      "shares; count ties break on the token") {
    import spark.implicits._
    val docs = Seq((0L, "a a a b b c")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(docs, ks = Seq(1, 2, 3))
      .collect()
      .map(r => (r.getAs[Long]("k"),
        (r.getAs[Long]("covered"), r.getAs[Double]("coverage")))).toMap
    assert(out == Map(1L -> (3L, 0.5), 2L -> (5L, 0.833333),
      3L -> (6L, 1.0)), s"$out")
    // tie a=2, b=2: k=1 must take 'a' (count DESC, token ASC)
    val tie = TextAnalysis.vocabCoverage(
      Seq((0L, "b b a a c")).toDF("doc_id", "text"), ks = Seq(1))
      .collect().head
    assert(tie.getAs[Long]("covered") == 2L &&
      tie.getAs[Double]("coverage") == 0.4, s"$tie")
  }

  test("heapsFit: a coining corpus fits beta near 1; a saturated " +
      "vocabulary reports beta 0 with a null fit quality") {
    import spark.implicits._
    // every doc coins one fresh token beside one shared: V ~ N/2
    val coin = (0L until 40L).map(i => (i, s"t$i common"))
      .toDF("doc_id", "text")
    val c = TextAnalysis.heapsFit(coin).collect().head
    assert(c.getAs[Long]("n_points") == 10L, s"$c")
    assert(c.getAs[Double]("beta") > 0.9, s"$c")
    assert(c.getAs[Double]("r2") > 0.99, s"$c")
    // two tokens forever: vocabulary flat across every checkpoint
    val flat = (0L until 40L).map(i => (i, "a b"))
      .toDF("doc_id", "text")
    val f = TextAnalysis.heapsFit(flat).collect().head
    assert(f.getAs[Double]("beta") == 0.0, s"$f")
    assert(f.isNullAt(f.fieldIndex("r2")), s"$f")
  }

  test("tokenizerFertility: punctuation-shattered text pays more " +
      "lexer tokens per word than plain prose") {
    import spark.implicits._
    // "ab cd": 2 lexer tokens / 2 words = 1.0
    // "a-b c.d": 6 lexer tokens (a,-,b / c,.,d) / 2 words = 3.0
    val docs = Seq((0L, "en", "ab cd"), (1L, "zz", "a-b c.d"))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.tokenizerFertility(docs).collect()
      .map(r => (r.getAs[String]("lang"),
        (r.getAs[Long]("n_docs"), r.getAs[Double]("fertility")))).toMap
    assert(out == Map("en" -> (1L, 1.0), "zz" -> (1L, 3.0)), s"$out")
  }

  test("distinctN: the n-gram diversity ladder prices repetition per " +
      "order exactly") {
    import spark.implicits._
    // "a b a b": distinct-1 = 2/4, distinct-2 = 2/3, distinct-3 = 2/2
    val out = TextAnalysis.distinctN(
      Seq((0L, "a b a b")).toDF("doc_id", "text")).collect()
      .map(r => (r.getAs[Long]("n"),
        (r.getAs[Long]("total"), r.getAs[Long]("distinct_types"),
          r.getAs[Double]("distinct_ratio")))).toMap
    assert(out(1L) == (4L, 2L, 0.5), s"$out")
    assert(out(2L) == (3L, 2L, 0.666667), s"$out")
    assert(out(3L) == (2L, 2L, 1.0), s"$out")
  }

  test("dupSizeHistogram: cluster sizes bucket with exact doc shares; " +
      "normalization folds case/whitespace variants together") {
    import spark.implicits._
    val docs = Seq("x common", "X  common", "x common ", "y two",
      "y two", "z one").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = graft.operators.Dedup.dupSizeHistogram(docs).collect()
      .map(r => (r.getAs[Long]("cluster_size"),
        (r.getAs[Long]("n_clusters"), r.getAs[Double]("doc_share"))))
      .toMap
    assert(out == Map(3L -> (1L, 0.5), 2L -> (1L, 0.333333),
      1L -> (1L, 0.166667)), s"$out")
  }

  test("sourceDispersion: a token spread like the corpus scores DP 0, " +
      "a single-source token scores its concentration exactly") {
    import spark.implicits._
    // sources A and B each hold half the corpus tokens; y splits
    // evenly (DP 0), x lives only in A, z only in B (DP 0.5 each)
    val docs = Seq((0L, "A", "x x y"), (1L, "B", "y z z"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceDispersion(docs, k = 3).collect()
      .map(r => (r.getAs[String]("token"),
        (r.getAs[Long]("n_occurrences"), r.getAs[Double]("dp")))).toMap
    assert(out == Map("x" -> (2L, 0.5), "y" -> (2L, 0.0),
      "z" -> (2L, 0.5)), s"$out")
  }

  test("columnStats: nulls counted, exact ndv, canonical min/max — " +
      "numeric columns ordered numerically, not lexically") {
    import spark.implicits._
    // orderkeys 2 and 10: a lexicographic max would say "2"
    val orders = Seq(
      (2L, Some(10L), "O", 1.5, "1996-01-02", "P"),
      (10L, None, "F", 2.5, "1997-03-04", "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "d", "o_orderpriority")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), to_date(col("d")).as("o_orderdate"),
        col("o_orderpriority"))
    val out = Quality.columnStats(orders).collect()
      .map(r => (r.getAs[String]("column"),
        (r.getAs[Long]("n_nulls"), r.getAs[Long]("ndv"),
          r.getAs[String]("min_val"), r.getAs[String]("max_val"))))
      .toMap
    assert(out("o_orderkey") == (0L, 2L, "2", "10"), s"$out")
    assert(out("o_custkey") == (1L, 1L, "10", "10"), s"$out")
    assert(out("o_totalprice_cents") == (0L, 2L, "150", "250"), s"$out")
    assert(out("o_orderdate") ==
      (0L, 2L, "1996-01-02", "1997-03-04"), s"$out")
    assert(out("o_orderpriority") == (0L, 1L, "P", "P"), s"$out")
  }

  test("columnStatsApprox: nulls/min/max exact, every NDV within 5% " +
      "of the exact profile, and the plan pays NO Expand") {
    val orders = graft.Tables.orders(spark, sf)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("column"),
        (r.getAs[Long]("n_nulls"), r.getAs[Long]("ndv"),
          r.getAs[String]("min_val"), r.getAs[String]("max_val"))))
      .toMap
    val exact = asMap(Quality.columnStats(orders))
    val approx = asMap(Quality.columnStatsApprox(orders))
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, (z, d, lo, hi)) =>
      val (za, da, loa, hia) = approx(c)
      assert(za == z && loa == lo && hia == hi, s"$c non-NDV drifted")
      assert(math.abs(da - d).toDouble / d <= 0.05,
        s"$c: approx ndv $da vs exact $d breaches 5%")
    }
    // the scale contract: exact NDVs expand the scan 6×, the HLL
    // profile must not expand it at all
    val planA = Quality.columnStatsApprox(orders)
      .queryExecution.executedPlan.toString
    assert(!planA.contains("Expand"), s"approx profile must not Expand")
    val planE = Quality.columnStats(orders)
      .queryExecution.executedPlan.toString
    assert(planE.contains("Expand"),
      "exact profile is the documented Expand trade (doc-comment)")
  }

  test("tableFingerprint: matches the hand md5 fold, survives " +
      "repartitioning unchanged, and moves on a one-character edit") {
    import spark.implicits._
    def orders(status2: String) = Seq(
      (1L, 10L, "O", 123.45, "1996-01-02", "1-URGENT"),
      (2L, 20L, status2, 67.8, "1997-03-04", "3-MEDIUM"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "d", "o_orderpriority")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), to_date(col("d")).as("o_orderdate"),
        col("o_orderpriority"))
    def handHash(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val expected = (handHash("1|10|O|12345|1996-01-02|1-URGENT") +
      handHash("2|20|F|6780|1997-03-04|3-MEDIUM")) % 1000000000000000000L
    val r = Quality.tableFingerprint(orders("F")).collect().head
    assert(r.getAs[Long]("n_rows") == 2L, s"$r")
    assert(r.getAs[Long]("fingerprint") == expected, s"$r vs $expected")
    // order/partitioning invariance: the fold is abelian
    val rp = Quality.tableFingerprint(orders("F").repartition(7))
      .collect().head
    assert(rp.getAs[Long]("fingerprint") == expected, s"$rp")
    // one flipped character in one row moves the sum
    val mut = Quality.tableFingerprint(orders("P")).collect().head
    assert(mut.getAs[Long]("fingerprint") != expected, s"$mut")
  }
}
