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

  test("knnJoin equals per-query ivfTopK for every probe (same codebook, same cells)") {
    import org.apache.spark.sql.functions.col
    val cb = SimilaritySearch.ivfCodebook(emb, 16)
    val probes = emb.filter(col("vec_id") < 20)
    val joined = SimilaritySearch.knnJoin(probes, emb, 3, cb, nProbe = 4)
      .collect()
      .map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("c_id"), r.getAs[Double]("cos")))
      .groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(t => (t._2, t._3)).sortBy(x => (-x._2, x._1)).toSeq }
    assert(joined.nonEmpty)
    joined.keys.foreach { p =>
      val single = SimilaritySearch.ivfTopK(emb, p, 3, cb, nProbe = 4).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq
      assert(joined(p) == single,
        s"probe $p: join=${joined(p)} single=$single")
    }
  }

  test("ivfProbe over a built index returns exactly ivfTopK's result") {
    val dir = s"target/graft_io/test/emb_ivf_${System.nanoTime()}"
    val cb = SimilaritySearch.buildIvfIndex(emb, 16, dir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))
    val plain = SimilaritySearch.ivfTopK(emb, 0L, 10, cb, nProbe = 4).collect().map(key)
    val probed = SimilaritySearch.ivfProbe(spark, dir, emb, cb, 0L, 10, nProbe = 4)
      .collect().map(key)
    assert(probed.sameElements(plain))
  }

  test("append to IVF and LSH indexes: probes equal the full-corpus build") {
    import org.apache.spark.sql.functions.col
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)

    val ivfDir = s"target/graft_io/test/emb_ivf_app_${System.nanoTime()}"
    val cb = SimilaritySearch.buildIvfIndex(half, 16, ivfDir)
    SimilaritySearch.appendToIvfIndex(rest, cb, ivfDir)
    assert(SimilaritySearch.ivfProbe(spark, ivfDir, emb, cb, 0L, 10, nProbe = 4)
      .collect().map(key).sameElements(
        SimilaritySearch.ivfTopK(emb, 0L, 10, cb, nProbe = 4).collect().map(key)))

    val planes = SimilaritySearch.seededPlanes(4, 64)
    val lshDir = s"target/graft_io/test/emb_lsh_app_${System.nanoTime()}"
    SimilaritySearch.buildLshIndex(half, planes, lshDir)
    SimilaritySearch.appendToLshIndex(rest, planes, lshDir)
    assert(SimilaritySearch.lshProbe(spark, lshDir, emb, 0L, 10, planes)
      .collect().map(key).sameElements(
        SimilaritySearch.lshTopK(emb, 0L, 10, planes).collect().map(key)))
  }

  test("recallReport hits exactly 1.0 when every cell is probed, bounded below") {
    import org.apache.spark.sql.functions.col
    val cb = SimilaritySearch.ivfCodebook(emb, 16)
    val probes = emb.filter(col("vec_id") < 20)
    // probing ALL cells = the exact candidate set, same tie order → 1.0
    val full = SimilaritySearch
      .recallReport(probes, emb, 5, cb, nProbe = cb.size).collect().head
    assert(full.getAs[Double]("recall") == 1.0)
    // pruned probing can only lose candidates, and the seeded codebook
    // keeps most of them at 4/16 cells
    val pruned = SimilaritySearch
      .recallReport(probes, emb, 5, cb, nProbe = 4).collect().head
    assert(pruned.getAs[Double]("recall") <= 1.0 &&
      pruned.getAs[Double]("recall") >= 0.5)
    assert(pruned.getAs[Long]("n_probes") == 20L)
  }

  test("knnJoinIndexed over a built index equals knnJoin with the same codebook") {
    import org.apache.spark.sql.functions.col
    val dir = s"target/graft_io/test/emb_knn_idx_${System.nanoTime()}"
    val cb = SimilaritySearch.buildIvfIndex(emb, 16, dir)
    val probes = emb.filter(col("vec_id") < 30)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("p_id"), r.getAs[Long]("c_id"), r.getAs[Double]("cos"))
    val direct = SimilaritySearch.knnJoin(probes, emb, 3, cb, nProbe = 4)
      .collect().map(key).sortBy(x => (x._1, -x._3, x._2))
    val indexed = SimilaritySearch.knnJoinIndexed(spark, dir, probes, 3, cb, nProbe = 4)
      .collect().map(key).sortBy(x => (x._1, -x._3, x._2))
    assert(indexed.sameElements(direct))
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

  test("filtered search: slice-only results; filtered ivfProbe recalls the exact slice top-k") {
    import org.apache.spark.sql.functions.col
    val slice = emb.filter(col("label") === 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = SimilaritySearch.bruteForceTopKWhere(emb, 0L, 10,
      col("label") === 3).collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(brute.size == 10 && brute.forall(slice),
      "exact filtered search must stay inside the metadata slice")
    val dir = s"target/graft_io/test/emb_ivf_filt_${System.nanoTime()}"
    val cb = SimilaritySearch.buildIvfIndex(emb, 16, dir)
    // a selective slice thins each probed cell (here ~10% of the corpus
    // spread over all 16 cells, and k is ~20% of the whole slice — the
    // worst case for filtered ANN), so recall must be bought by widening
    // nProbe: it rises monotonically and converges to the EXACT slice
    // result when every cell is probed (cosines are exact throughout)
    def at(nProbe: Int) = SimilaritySearch.ivfProbe(spark, dir, emb, cb,
      0L, 10, nProbe = nProbe, pred = col("label") === 3)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val recalls = Seq(4, 8, 16).map { np =>
      val got = at(np)
      assert(got.forall(slice), "filtered probe must never leak out of the slice")
      got.count(brute.toSet).toDouble / brute.size
    }
    assert(recalls == recalls.sorted, s"recall not monotone in nProbe: $recalls")
    assert(at(16) == brute,
      "probing every cell must reproduce the exact filtered top-k")
  }

  test("rangeSearch returns exactly the above-threshold slice of the full ranking") {
    val emb = Tables.embeddings(spark, sf)
    val all = SimilaritySearch.rangeSearch(emb, 0L, -1.1).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    assert(all.size == emb.count() - 1, "tau=-1.1 must keep every other vector")
    val tau = 0.2
    val ranged = SimilaritySearch.rangeSearch(emb, 0L, tau).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    assert(ranged == all.filter(_._2 >= tau),
      "range result must be the exact >= tau subset with identical scores")
    // consistent with top-k: every top-10 hit above tau appears in the range set
    val top = SimilaritySearch.bruteForceTopK(emb, 0L, 10).collect()
      .filter(_.getAs[Double]("cos") >= tau).map(_.getAs[Long]("vec_id"))
    assert(top.forall(ranged.contains))
  }

  test("multiprobe LSH: recall monotone in flipped buckets, never below single-probe") {
    val planes = SimilaritySearch.seededPlanes(4, 64)
    val dir = s"target/graft_io/test/emb_lsh_mp_${System.nanoTime()}"
    SimilaritySearch.buildLshIndex(emb, planes, dir)
    val brute = SimilaritySearch.bruteForceTopK(emb, 0L, 10).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    def recall(flips: Int) = SimilaritySearch
      .lshProbeMulti(spark, dir, emb, 0L, 10, planes, nFlips = flips)
      .collect().map(_.getAs[Long]("vec_id")).toSet
      .intersect(brute).size / 10.0
    val r0 = recall(0) // = single-probe lshProbe
    val r2 = recall(2)
    val rAll = recall(4)
    assert(r0 <= r2 + 1e-9 && r2 <= rAll + 1e-9,
      s"recall must be monotone in probes: $r0 / $r2 / $rAll")
    assert(rAll >= 0.5, s"full Hamming-1 probe recall floor: $rAll")
    assert(rAll > r0,
      s"on this corpus the extra probes must actually recover misses: $r0 → $rAll")
    // flips=0 degenerates exactly to the single-probe result
    val single = SimilaritySearch.lshProbe(spark, dir, emb, 0L, 10, planes)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    val multi0 = SimilaritySearch
      .lshProbeMulti(spark, dir, emb, 0L, 10, planes, nFlips = 0)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    assert(single.sameElements(multi0))
  }

  test("knnClassifierEval: separated clusters score 1.0, planted flip is charged") {
    import spark.implicits._
    // two tight clusters around orthogonal axes; a small deterministic
    // wobble keeps neighbors distinct
    def vec(axis: Int, i: Int): Array[Float] = {
      val a = new Array[Float](8)
      a(axis) = 1.0f; a(4 + axis) = 0.01f * i
      a
    }
    val rows = (0 until 20).map(i => (i.toLong, vec(0, i), 0)) ++
      (20 until 40).map(i => (i.toLong, vec(1, i - 20), 1))
    val clean = rows.toDF("vec_id", "embedding", "label")
    val out = SimilaritySearch.knnClassifierEval(clean).collect()
      .map(r => r.getAs[Int]("true_label") ->
        ((r.getAs[Long]("n_eval"), r.getAs[Double]("accuracy")))).toMap
    assert(out == Map(0 -> ((2L, 1.0)), 1 -> ((2L, 1.0))), s"$out")
    // flip ONE probe's label: its k neighbors still vote the cluster's
    // true class, so exactly that probe is scored wrong
    val flipped = rows.map { case (id, e, l) =>
      (id, e, if (id == 0L) 1 else l)
    }.toDF("vec_id", "embedding", "label")
    val f = SimilaritySearch.knnClassifierEval(flipped).collect()
      .map(r => r.getAs[Int]("true_label") ->
        r.getAs[Long]("n_correct")).toMap
    assert(f(1) == 2L, s"the flipped probe lands in class 1 and misses: $f")
  }
}
