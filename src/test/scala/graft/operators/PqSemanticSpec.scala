package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Product-quantization ANN and semantic dedup, validated against their
  * exact oracle-checked counterparts (bruteForceTopK /
  * embeddingNearDupPairs). */
class PqSemanticSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("PQ codebooks are deterministic with the right shape") {
    val a = ProductQuantization.trainCodebooks(emb, m = 16, ksub = 16)
    val b = ProductQuantization.trainCodebooks(emb, m = 16, ksub = 16)
    assert(a == b, "seeded training must be reproducible")
    assert(a.size == 16)
    // EXACTLY ksub entries per subspace — pqTopK's ADC tables stride by
    // ksub, so a ragged codebook silently corrupts later-subspace offsets
    a.foreach { cb => assert(cb.size == 16)
      cb.foreach(c => assert(c.size == 4)) }
  }

  test("degenerate corpus (< ksub distinct subvectors) pads codebooks and scores correctly") {
    import spark.implicits._
    // 3 distinct base vectors, repeated — every subspace trains < 16 centroids
    val base = Seq.tabulate(3)(i => Array.tabulate(64)(d => (i * 64 + d).toFloat / 100f))
    val tiny = (0L until 30L).map(id => (id, base((id % 3).toInt)))
      .toDF("vec_id", "embedding")
    val cbs = ProductQuantization.trainCodebooks(tiny, m = 16, ksub = 16)
    cbs.foreach(cb => assert(cb.size == 16, "padding must restore uniform ksub"))
    val dir = s"target/graft_io/test/emb_pq_d_${System.nanoTime()}"
    ProductQuantization.encode(tiny, cbs)
      .write.mode("overwrite").parquet(dir)
    val pq = ProductQuantization.pqTopK(spark, dir, tiny, 0L, 5, cbs).collect()
    assert(pq.length == 5)
    // ids ≡ 0 (mod 3) are exact copies of the query → true cosine 1.0 and
    // the ADC score must surface them; any null/garbage score breaks this
    val perfect = pq.filter(_.getAs[Double]("cos") >= 0.9999).map(_.getAs[Long]("vec_id"))
    assert(perfect.length == 5 && perfect.forall(_ % 3 == 0),
      s"expected the 5 exact copies, got ${pq.mkString(",")}")
  }

  test("encode yields one in-range code per subspace, deterministically") {
    val cbs = ProductQuantization.trainCodebooks(emb, m = 16, ksub = 16)
    val codes = ProductQuantization.encode(emb, cbs).cache()
    assert(codes.count() == emb.count())
    val bad = codes.filter(size(col("code")) =!= 16 ||
      exists(col("code"), c => c < 0 || c >= 16))
    assert(bad.isEmpty)
    val again = ProductQuantization.encode(emb, cbs)
    assert(codes.exceptAll(again).isEmpty)
    codes.unpersist()
  }

  test("pqTopK recall vs brute force; reranked cosines are exact") {
    val dir = s"target/graft_io/test/emb_pq_${System.nanoTime()}"
    val cbs = ProductQuantization.buildPqIndex(emb, 16, 16, dir)
    val brute = SimilaritySearch.bruteForceTopK(emb, 0L, 10).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    val pq = ProductQuantization.pqTopK(spark, dir, emb, 0L, 10, cbs).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    assert(pq.size == 10)
    // the rerank stage computes TRUE cosines, so hits match brute exactly
    pq.foreach { case (id, c) =>
      if (brute.contains(id)) assert(math.abs(brute(id) - c) < 1e-9)
    }
    val recall = pq.keySet.intersect(brute.keySet).size.toDouble / brute.size
    assert(recall >= 0.8, s"PQ recall $recall below floor")
  }

  test("pqTopK on a missing query id returns empty, not a crash") {
    val dir = s"target/graft_io/test/emb_pq_m_${System.nanoTime()}"
    val cbs = ProductQuantization.buildPqIndex(emb, 16, 16, dir)
    assert(ProductQuantization.pqTopK(spark, dir, emb, -999L, 10, cbs).isEmpty)
  }

  test("SQ8 codes stay in [0,255], encode deterministically, and norms are exact") {
    val (mn, mx) = ScalarQuantization.trainBounds(emb)
    assert(mn.size == 64 && mx.size == 64)
    assert(mn.indices.forall(i => mx(i) > mn(i)), "padded bounds must have width")
    assert((mn, mx) == ScalarQuantization.trainBounds(emb),
      "seeded bound training must be reproducible")
    val codes = ScalarQuantization.encode(emb, mn, mx).cache()
    assert(codes.count() == emb.count())
    assert(codes.filter(size(col("code")) =!= 64 ||
      exists(col("code"), c => c < 0 || c > 255)).isEmpty)
    // stored norm is the true embedding norm
    import graft.functions.VectorFunctions.l2Norm
    val normDiff = codes.join(emb, "vec_id")
      .filter(abs(col("norm") - l2Norm(col("embedding"))) > lit(1e-6))
    assert(normDiff.isEmpty)
    codes.unpersist()
  }

  test("sq8TopK recall vs brute force; reranked cosines are exact; missing id is empty") {
    val dir = s"target/graft_io/test/emb_sq8_${System.nanoTime()}"
    val (mn, mx) = ScalarQuantization.buildSq8Index(emb, dir)
    val brute = SimilaritySearch.bruteForceTopK(emb, 0L, 10).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    val sq = ScalarQuantization.sq8TopK(spark, dir, emb, 0L, 10, mn, mx).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    assert(sq.size == 10)
    sq.foreach { case (id, c) =>
      if (brute.contains(id)) assert(math.abs(brute(id) - c) < 1e-9)
    }
    val recall = sq.keySet.intersect(brute.keySet).size.toDouble / brute.size
    // 8-bit per-dim quantization is tighter than PQ's 4-bit codes — hold
    // it to a higher floor
    assert(recall >= 0.9, s"SQ8 recall $recall below floor")
    assert(ScalarQuantization.sq8TopK(spark, dir, emb, -999L, 10, mn, mx).isEmpty)
  }

  test("semanticDedup collapses planted duplicate vectors to one representative") {
    val cb = SimilaritySearch.ivfCodebook(emb, 16)
    // plant exact copies of vectors 1..5 under new ids — same cell, cos=1
    val planted = emb.unionByName(
      emb.filter(col("vec_id") < 5).withColumn("vec_id", col("vec_id") + 10000))
    val kept = Dedup.semanticDedup(planted, cb, 0.99).cache()
    // every planted copy must be dropped (its original has the smaller id)
    assert(kept.filter(col("vec_id") >= 10000).isEmpty)
    assert(kept.filter(col("vec_id") < 5).count() == 5)
    kept.unpersist()
  }

  test("semanticDedup keeps no intra-cell pair above the threshold") {
    val cb = SimilaritySearch.ivfCodebook(emb, 16)
    val thr = 0.5
    val kept = Dedup.semanticDedup(emb, cb, thr)
    val keptIds = kept.select("vec_id")
    import graft.functions.VectorFunctions.{dot, l2Norm}
    val keptEmb = emb.join(keptIds, "vec_id")
      .select(col("vec_id"), col("embedding"), l2Norm(col("embedding")).as("nrm"))
    val cells = kept.select(col("vec_id"), col("cell"))
    val x = keptEmb.join(cells, "vec_id")
      .select(col("cell"), col("vec_id").as("v1"), col("embedding").as("e1"),
        col("nrm").as("n1"))
    val y = keptEmb.join(cells, "vec_id")
      .select(col("cell"), col("vec_id").as("v2"), col("embedding").as("e2"),
        col("nrm").as("n2"))
    val survivors = x.join(y, Seq("cell")).filter(col("v1") < col("v2"))
      .filter(round(dot(col("e1"), col("e2")) /
        (col("n1") * col("n2")), 4) >= thr)
    assert(survivors.isEmpty,
      "two kept vectors in one cell exceed the dedup threshold")
  }
}
