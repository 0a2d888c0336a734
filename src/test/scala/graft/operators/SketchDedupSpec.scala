package graft.operators

import graft.{SparkSpec, Tables}

class SketchDedupSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  /** ground truth: high-overlap pairs from the exact Jaccard operator */
  private lazy val truth: Map[(Long, Long), Double] =
    Dedup.ngramJaccardPairs(docs, 3, 0.8).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) -> r.getAs[Double]("jaccard"))
      .toMap

  test("minhash LSH recalls every >=0.8 true-jaccard pair") {
    val found = SketchDedup.minhashLshPairs(docs, threshold = 0.5).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) -> r.getAs[Double]("est_jaccard"))
      .toMap
    assert(truth.nonEmpty, "test data should contain planted near-dups")
    truth.keys.foreach { p => assert(found.contains(p), s"missed planted pair $p") }
    // estimates for found pairs are plausible for k=32 (3-sigma ≈ 0.27)
    truth.foreach { case (p, j) =>
      assert(math.abs(found(p) - j) <= 0.3, s"pair $p est ${found(p)} vs true $j")
    }
  }

  test("minhash signatures are deterministic across runs") {
    val a = SketchDedup.withMinHashSignature(docs).orderBy("doc_id").collect()
    val b = SketchDedup.withMinHashSignature(docs).orderBy("doc_id").collect()
    assert(a.map(_.getSeq[Long](1)).zip(b.map(_.getSeq[Long](1))).forall {
      case (x, y) => x == y
    })
  }

  test("simhash banding finds exactly the pairs within the hamming budget") {
    import org.apache.spark.sql.functions._
    val found = SketchDedup.simhashPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) -> r.getAs[Int]("hamming"))
      .toMap
    // brute-force ground truth over all simhash pairs
    val sims = SketchDedup.withSimHash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sim"))
    val exact = (for {
      (d1, s1) <- sims; (d2, s2) <- sims if d1 < d2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= 3
    } yield (d1, d2) -> h).toMap
    // pigeonhole guarantee: 4 chunks recall every hamming<=3 pair, exactly
    assert(found == exact)
    assert(found.nonEmpty, "test data should contain hamming<=3 pairs")
  }

  test("brute-force and banded simhash strategies emit identical pairs") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming"))
    val banded = SketchDedup.simhashPairs(docs).collect().map(key).toSet
    val brute = SketchDedup.simhashPairsBrute(docs).collect().map(key).toSet
    assert(banded == brute)
  }

  test("simhash of identical token sets is identical") {
    import org.apache.spark.sql.functions._
    val dup = docs.limit(3)
    val sims = SketchDedup.withSimHash(dup.unionByName(dup))
      .groupBy("doc_id").agg(countDistinct("sim").as("n")).collect()
    assert(sims.forall(_.getAs[Long]("n") == 1L))
  }

  test("simhashPairs emits the complete pair set for a pathological identical-doc group") {
    import org.apache.spark.sql.functions._
    // the boilerplate worst case: thousands of docs with ONE sketch. The
    // chunked expansion must emit all n·(n−1)/2 pairs without ever
    // building more than groupChunk² structs in a single row.
    val n = 4000L
    val docs = spark.range(n).select(col("id").as("doc_id"),
      lit("the same boilerplate body repeated for every document here").as("text"))
    val pairs = SketchDedup.simhashPairs(docs, groupChunk = 256)
    assert(pairs.count() == n * (n - 1) / 2)
  }

  test("sourceJaccard tracks the exact per-pair shingle-set Jaccard and replays") {
    import org.apache.spark.sql.functions._
    val documents = graft.Tables.documents(spark, sf)
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getString(1))
    val est = SketchDedup.sourceJaccard(documents, k = 64)
      .collect().map(r => key(r) -> r.getAs[Double]("est_jaccard")).toMap
    // exact Jaccard of the groups' (poly-fingerprinted) shingle SETS —
    // the quantity the merged CW sketch estimates since the r13 re-key
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val sets: Map[String, Set[Long]] = documents
      .select(col("source"), explode(ColumnBridge.column(
        graft.plans.ShinglePolyHashes(ColumnBridge.expression(
          col("text")), 3))).as("sh"))
      .distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet)
      .toMap
    assert(est.nonEmpty)
    est.foreach { case ((a, b), e) =>
      val (sa, sb) = (sets(a), sets(b))
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      // k=64 ⇒ binomial s.e. √(J(1−J)/64) ≤ 0.063; 4 s.e. guard band
      assert(math.abs(e - exact) < 0.25,
        s"($a,$b): est $e vs exact $exact")
    }
    val replay = SketchDedup.sourceJaccard(documents, k = 64)
      .collect().map(r => key(r) -> r.getAs[Double]("est_jaccard")).toMap
    assert(replay == est, "merged sketches are deterministic")
  }

  test("contrastivePairs: symmetric positives, pool negatives exclude positives and self") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val pairs = SketchDedup.contrastivePairs(docs).collect()
      .map(r => (r.getAs[Long]("anchor"), r.getAs[Long]("other"),
        r.getAs[Int]("label")))
    val pos = pairs.filter(_._3 == 1).map(p => (p._1, p._2)).toSet
    val neg = pairs.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    assert(pos.nonEmpty && neg.nonEmpty)
    // positives are symmetric; negatives never collide with a positive
    pos.foreach { case (a, o) => assert(pos.contains((o, a))) }
    assert(neg.intersect(pos).isEmpty)
    pairs.foreach { case (a, o, _) => assert(a != o, "no self-pairs") }
    // every anchor with a positive also carries explicit negatives
    // (minus pool collisions), and the output replays identically
    val anchors = pos.map(_._1)
    val negAnchors = neg.map(_._1)
    assert(anchors.subsetOf(negAnchors ++ anchors.filter(a =>
      !negAnchors.contains(a))))
    assert(SketchDedup.contrastivePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet ==
      pairs.toSet)
  }

  test("lshEval report is internally consistent and clears the recall floor") {
    val docs = graft.Tables.documents(spark, sf)
    val r = SketchDedup.lshEval(docs, 3, 0.5).collect().head
    val (nTrue, nRet, nTp) = (r.getAs[Long]("n_true"),
      r.getAs[Long]("n_retrieved"), r.getAs[Long]("n_tp"))
    assert(nTp <= math.min(nTrue, nRet))
    assert(r.getAs[Double]("precision") == math.rint(nTp.toDouble / nRet * 1e4) / 1e4 ||
      nRet == 0)
    // the sketch path must find most true >=0.5-jaccard pairs — the
    // measured number that justifies LSH at scale
    assert(nTrue == 0 || r.getAs[Double]("recall") >= 0.6,
      s"recall ${r.getAs[Double]("recall")} below floor (true=$nTrue tp=$nTp)")
    // determinism: the report replays bit-identically
    assert(SketchDedup.lshEval(docs, 3, 0.5).collect().head == r)
  }
}
