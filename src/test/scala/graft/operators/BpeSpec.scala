package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  import spark.implicits._

  // the classic Sennrich corpus: low×5, lower×2, newest×6, widest×3
  private def corpus = Seq(
    (1L, Seq.fill(5)("low").mkString(" ")),
    (2L, Seq.fill(2)("lower").mkString(" ")),
    (3L, Seq.fill(6)("newest").mkString(" ")),
    (4L, Seq.fill(3)("widest").mkString(" ")))
    .toDF("doc_id", "text")

  test("trainMerges reproduces the hand-computed merge sequence") {
    // round 1: (e,s)=9 ties (s,t)=9, (t,</w>)=9 → 'e' wins asc
    // round 2: (es,t)=9 ties (t,</w>)=9 → 'es' < 't'
    // round 3: (est,</w>)=9
    // round 4: (l,o)=7 ties (o,w)=7 → 'l' < 'o'
    // round 5: (lo,w)=7
    // round 6: (e,w)=6 ties (n,e), (w,est</w>) → 'e' < 'n' < 'w'
    val m = Bpe.trainMerges(corpus, 6).collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_freq")))
    assert(m.toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "est", "</w>", 9L),
      (4, "l", "o", 7L), (5, "lo", "w", 7L), (6, "e", "w", 6L)))
  }

  test("trainMerges stops early once the vocabulary is fully merged") {
    val tiny = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    // 'ab</w>' fully merges in 2 rounds; asking for 10 returns 2
    val m = Bpe.trainMerges(tiny, 10).collect()
    assert(m.length == 2)
    val merged = m.map(_.getAs[String]("merged")).toSet
    assert(merged.contains("ab</w>") || merged.contains("ab"))
  }

  test("applyMerges tokenizes with the trained table (round trip)") {
    val trained = Bpe.trainMerges(corpus, 5).collect()
      .sortBy(_.getAs[Int]("merge_rank"))
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    val toks = Bpe.applyMerges(Seq((9L, "lowest")).toDF("doc_id", "text"), trained)
      .collect().head.getAs[scala.collection.Seq[String]]("syms").toSeq
    // merges 1-5: es, est, est</w>, lo, low → lowest = [low, est</w>]
    assert(toks == Seq("low", "est</w>"))
  }

  test("merge fold is greedy leftmost-first (aaa → [aa, a])") {
    val out = Bpe.applyMerges(Seq((1L, "aaa")).toDF("doc_id", "text"),
      Seq(("a", "a")))
      .collect().head.getAs[scala.collection.Seq[String]]("syms").toSeq
    assert(out == Seq("aa", "a", "</w>"))
  }

  test("trained merges strictly compress the corpus they were trained on") {
    val docs = graft.Tables.documents(spark, sf).limit(100)
    val trained = Bpe.trainMerges(docs, 8).collect()
      .sortBy(_.getAs[Int]("merge_rank"))
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    assert(trained.nonEmpty)
    def totalSyms(merges: Seq[(String, String)]): Long =
      Bpe.applyMerges(docs, merges)
        .agg(sum(size(col("syms")))).head().getLong(0)
    val merged = totalSyms(trained)
    val raw = totalSyms(Nil)
    assert(merged < raw,
      s"8 merges must shrink the symbol stream: $merged !< $raw")
  }
}
