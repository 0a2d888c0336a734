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
