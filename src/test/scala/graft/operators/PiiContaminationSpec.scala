package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PiiContaminationSpec extends SparkSpec {

  import spark.implicits._

  test("piiScan counts and redacts emails, phones, IPs") {
    val docs = Seq(
      (1L, "contact me at alice@example.com or bob.smith@corp.co.uk thanks"),
      (2L, "call +1 (555) 123-4567 now"),
      (3L, "server at 192.168.0.1 and 10.0.0.255 down"),
      (4L, "clean text with no pii at all"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiScan(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_email"), r.getAs[Int]("n_phone"), r.getAs[Int]("n_ipv4")))
      .toMap
    assert(out(1L) == ((2, 0, 0)))
    assert(out(2L) == ((0, 1, 0)))
    assert(out(3L) == ((0, 0, 2)))
    assert(out(4L) == ((0, 0, 0)))
    // redaction shrinks or rewrites, never leaves the raw match length-intact
    val redLen = TextAnalysis.piiScan(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("redacted_len")).toMap
    assert(redLen(4L) == "clean text with no pii at all".length)
    assert(redLen(1L) != docs.filter($"doc_id" === 1).first().getString(1).length)
  }

  test("contamination flags docs overlapping the benchmark, not clean ones") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu " +
        "nu xi omicron pi extra words"), // near-copy → contaminated
      (2L, "totally different words about unrelated things here entirely"))
      .toDF("doc_id", "text")
    val hits = TextAnalysis.contamination(docs, bench, n = 5, minShared = 5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(hits == Set(1L))
  }

  test("decontaminate drops exactly the flagged docs, keeps the rest") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu " +
        "nu xi omicron pi extra words", 95L),
      (2L, "totally different words about unrelated things here entirely", 61L),
      (3L, "another clean document with its own vocabulary and nothing shared", 66L))
      .toDF("doc_id", "text", "n_chars")
    val kept = TextAnalysis.decontaminate(docs, bench, n = 5, minShared = 5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val flagged = TextAnalysis.contamination(docs, bench, n = 5, minShared = 5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(2L, 3L))
    // kept and flagged partition the corpus — nothing lost, nothing doubled
    assert((kept ++ flagged) == Set(1L, 2L, 3L) && (kept & flagged).isEmpty)
  }
}
