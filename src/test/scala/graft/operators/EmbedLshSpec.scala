package graft.operators

import graft.{SparkSpec, Tables}

/** The bucketed scale twins for embedding similarity: pruned ANN probe
  * and multi-table LSH near-dup pairs, both validated against their
  * exact oracle-checked counterparts. */
class EmbedLshSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("lshTopKPruned returns exactly lshTopK's result (layout change only)") {
    val planes = SimilaritySearch.seededPlanes(4, 64)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))
    val plain = SimilaritySearch.lshTopK(emb, 0L, 10, planes).collect().map(key)
    val pruned = SimilaritySearch.lshTopKPruned(spark, emb, 0L, 10, planes,
      "target/graft_io/test/emb_lake").collect().map(key)
    assert(pruned.sameElements(plain))
  }

  test("neardupPairsLsh: every found pair carries the exact cosine; recall is high") {
    val exact = Dedup.embeddingNearDupPairs(emb, 0.3).collect()
      .map(r => (r.getAs[Long]("v1"), r.getAs[Long]("v2")) -> r.getAs[Double]("cos"))
      .toMap
    val lsh = SimilaritySearch.neardupPairsLsh(emb, 0.3).collect()
      .map(r => (r.getAs[Long]("v1"), r.getAs[Long]("v2")) -> r.getAs[Double]("cos"))
      .toMap
    assert(exact.nonEmpty, "test data should contain cos>=0.3 pairs")
    // no false positives: every LSH pair is a true pair with the same cosine
    lsh.foreach { case (p, c) =>
      assert(exact.contains(p), s"LSH emitted non-pair $p")
      assert(math.abs(exact(p) - c) < 1e-9)
    }
    // recall: 16 tables x 4 planes gives ~0.89 expected at theta~72deg;
    // planes are seeded so this is deterministic, floor leaves margin
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.75, s"recall $recall below floor (${lsh.size}/${exact.size})")
  }
}
