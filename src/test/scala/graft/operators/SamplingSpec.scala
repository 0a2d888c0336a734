package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("mixtureSample hits target rates and is deterministic") {
    val docs = Tables.documents(spark, sf)
    val weights = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 1.5,
      "es" -> 2.0, "zh" -> 0.25)
    val out = Sampling.mixtureSample(docs, "doc_id", "lang", weights)
    val in = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // integral weights are exact; fractional ones binomial around w*n
    assert(got("de") == in("de"))
    assert(got.getOrElse("es", 0L) == 2 * in("es"))
    assert(math.abs(got("en") - 0.5 * in("en")) <= 0.35 * in("en"))
    // copies are indexed 0..n-1 (es weight 2.0: exactly copies 0 and 1)
    val esCopies = out.filter(col("lang") === "es")
      .groupBy("doc_id").agg(sort_array(collect_list("copy")).as("cs"))
    assert(esCopies.filter(col("cs") =!= array(lit(0), lit(1))).isEmpty)
    // deterministic across runs
    val again = Sampling.mixtureSample(docs, "doc_id", "lang", weights)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("mixtureSample drops domains absent from the weights map") {
    val docs = Tables.documents(spark, sf)
    val out = Sampling.mixtureSample(docs, "doc_id", "lang", Map("en" -> 1.0))
    assert(out.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("en"))
    assert(out.count() == docs.filter(col("lang") === "en").count())
  }

  test("deterministicShuffle covers every row once with dense in-shard ranks") {
    val docs = Tables.documents(spark, sf)
    val out = Sampling.deterministicShuffle(docs, "doc_id").cache()
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // pos is 1..count(shard) dense within each shard
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("nd"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("nd") =!= col("n"))
    assert(bad.isEmpty)
    // stable under corpus growth: a row keeps its shard when rows are added
    val grown = Sampling.deterministicShuffle(
      docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 100000)), "doc_id")
    val moved = out.select(col("doc_id"), col("shard").as("s1"))
      .join(grown.select(col("doc_id"), col("shard").as("s2")), "doc_id")
      .filter(col("s1") =!= col("s2"))
    assert(moved.isEmpty)
    out.unpersist()
  }

  test("stratifiedFixed takes k per stratum (or the whole small stratum)") {
    val docs = Tables.documents(spark, sf)
    val k = 5
    val out = Sampling.stratifiedFixed(docs, "doc_id", "lang", k)
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0L) == math.min(k.toLong, n))
    }
    // sample membership is stable: the same k rows on every run
    val again = Sampling.stratifiedFixed(docs, "doc_id", "lang", k)
    assert(out.exceptAll(again).isEmpty)
  }

  test("stratifiedFixed rank filter plans as a map-side WindowGroupLimit") {
    val plan = Sampling.stratifiedFixed(
      Tables.documents(spark, sf), "doc_id", "lang", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  test("classBalance equalizes every class to the smallest; equals stratifiedFixed at that k") {
    val docs = Tables.documents(spark, sf)
    val minC = docs.groupBy("lang").count()
      .agg(org.apache.spark.sql.functions.min("count")).collect().head.getLong(0)
    val bal = Sampling.classBalance(docs, "doc_id", "lang")
    val sizes = bal.groupBy("lang").count().collect().map(_.getLong(1)).toSet
    assert(sizes == Set(minC), s"every class must hold exactly $minC rows: $sizes")
    // deterministic: the same sample as the fixed-k sampler with the
    // same salt at k = min class size (the documented fast path)
    val fixed = Sampling.stratifiedFixed(docs, "doc_id", "lang",
      minC.toInt, salt = "bal")
    assert(bal.select("doc_id").exceptAll(fixed.select("doc_id")).isEmpty &&
      fixed.select("doc_id").exceptAll(bal.select("doc_id")).isEmpty)
  }

  test("weightedSample: p=0 drops all, p~1 keeps ~all, keep-sets nest as p grows") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    assert(Sampling.weightedSample(docs, "doc_id", lit(0.0)).count() == 0L)
    // p clamps just under 1: misses at most a ~2^-24 sliver
    val nearAll = Sampling.weightedSample(docs, "doc_id", lit(1.0)).count()
    assert(nearAll >= n - 1)
    // same salt => same uniforms: a larger p strictly widens the keep set
    val lo = Sampling.weightedSample(docs, "doc_id", lit(0.2))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hi = Sampling.weightedSample(docs, "doc_id", lit(0.6))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi))
    assert(math.abs(lo.size.toDouble / n - 0.2) < 0.06,
      s"keep rate ${lo.size.toDouble / n} far from p=0.2")
    // per-row weights: rerun is bit-identical (no RNG state anywhere)
    val w1 = Sampling.weightedSample(docs, "doc_id", col("n_chars") / 600.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val w2 = Sampling.weightedSample(docs, "doc_id", col("n_chars") / 600.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(w1 == w2 && w1.nonEmpty)
  }

  test("trainValTestSplit: total, roughly-proportioned, growth-stable") {
    val docs = graft.Tables.documents(spark, sf)
    val n = docs.count()
    val s1 = Sampling.trainValTestSplit(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1.size == n, "every row gets exactly one split")
    val frac = s1.values.groupBy(identity).view.mapValues(_.size.toDouble / n)
    assert(math.abs(frac("train") - 0.8) < 0.06, s"train=${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.05 &&
      math.abs(frac("test") - 0.1) < 0.05)
    // growth stability: splitting HALF the corpus assigns the shared
    // rows identically — appends can never shuffle eval membership
    val half = Sampling.trainValTestSplit(
      docs.filter(col("doc_id") % 2 === 0), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half.forall { case (id, sp) => s1(id) == sp })
    // a different salt is a genuinely different split
    val resalted = Sampling.trainValTestSplit(docs, "doc_id", salt = "v2")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(resalted.exists { case (id, sp) => s1(id) != sp })
  }
}
