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

  test("ivfCodebook is deterministic, unit-norm, with one entry per requested cell") {
    val cb1 = SimilaritySearch.ivfCodebook(emb, 16)
    val cb2 = SimilaritySearch.ivfCodebook(emb, 16)
    assert(cb1 == cb2, "seeded codebook must be reproducible")
    assert(cb1.size == 16)
    cb1.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"centroid norm $n not unit")
    }
  }

  test("ivfTopK recall vs brute force; every hit carries the true cosine") {
    val brute = SimilaritySearch.bruteForceTopK(emb, 0L, 10).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    val cb = SimilaritySearch.ivfCodebook(emb, 16)
    val ivf = SimilaritySearch.ivfTopK(emb, 0L, 10, cb, nProbe = 4).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    assert(ivf.size == 10)
    // cosines are exact (IVF only prunes the candidate set)
    ivf.foreach { case (id, c) =>
      if (brute.contains(id)) assert(math.abs(brute(id) - c) < 1e-9)
    }
    // probing 4/16 cells must still recover most of the true top-10;
    // seeded codebook makes this deterministic
    val recall = ivf.keySet.intersect(brute.keySet).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall below floor")
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
