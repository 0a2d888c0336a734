package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {

  test("exactStats finds injected duplicates") {
    val docs = Tables.documents(spark, sf)
    val withDups = docs.unionByName(docs.limit(5)) // plant 5 exact dups
    val r = Dedup.exactStats(withDups).first()
    val n = docs.count()
    assert(r.getAs[Long]("n_docs") == n + 5)
    assert(r.getAs[Long]("n_dup_docs") >= 5)
  }

  test("dropExactDuplicates keeps smallest doc_id and is idempotent") {
    val docs = Tables.documents(spark, sf)
    val withDups = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 10000))
    val kept = Dedup.dropExactDuplicates(withDups)
    assert(kept.count() == docs.count())
    assert(kept.agg(max("keep_id")).first().getLong(0) < 10000)
  }

  test("ngramJaccardPairs surfaces planted near-duplicates symmetric in [0,1]") {
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, sf), 3, 0.2).collect()
    pairs.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.2 && j <= 1.0)
      assert(r.getAs[Long]("d1") < r.getAs[Long]("d2"))
    }
  }

  test("rollingHash is deterministic and content-sensitive") {
    val fp = TextAnalysis.rollingFingerprints(Tables.documents(spark, sf))
    val a = fp.orderBy("doc_id").collect()
    val b = TextAnalysis.rollingFingerprints(Tables.documents(spark, sf))
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.map(_.getAs[Long]("fp_roll")).distinct.length > a.length / 2)
  }

  test("quality scores are bounded in [0,1]") {
    TextAnalysis.qualityScores(Tables.documents(spark, sf)).collect().foreach { r =>
      val q = r.getAs[Double]("quality_score")
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("langid covers all profiles deterministically") {
    val out = TextAnalysis.languageId(Tables.documents(spark, sf))
    val langs = out.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("sql", "perf", "data", "en")))
  }

  test("LSH bucket candidates are a subset of brute-force ranking order") {
    val emb = Tables.embeddings(spark, sf)
    val planes = SimilaritySearch.seededPlanes(4, 64)
    val lsh = SimilaritySearch.lshTopK(emb, 0L, 10, planes)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    val brute = SimilaritySearch.bruteForceTopK(emb, 0L, 200)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    // every LSH hit must carry the same cosine the exact scan computed
    lsh.foreach { case (id, c) =>
      assert(!brute.contains(id) || math.abs(brute(id) - c) < 1e-9)
    }
    assert(lsh.nonEmpty)
  }

  test("bruteForceTopK is the true top-k (cross-checked against full sort)") {
    val emb = Tables.embeddings(spark, sf)
    import graft.functions.VectorFunctions.cosine
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qe"))
    val full = emb.filter(col("vec_id") =!= 0L).crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 4).as("cos"))
      .orderBy(desc("cos"), asc("vec_id")).limit(10)
      .collect().map(_.getAs[Long]("vec_id"))
    val topk = SimilaritySearch.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(topk.sameElements(full))
  }
}
