package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  import spark.implicits._

  test("kmeansFit separates two planted angular clusters exactly") {
    // two tight cones around orthogonal axes: Lloyd's must put one
    // centroid on each and assign every point to its own cone
    val rows =
      (0 until 10).map(i => (i.toLong,
        Seq(10.0f, (i % 3) * 0.1f, 0.0f), 0)) ++
      (0 until 10).map(i => (100L + i,
        Seq(0.0f, (i % 3) * 0.1f, 10.0f), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val (cb, trace) = SimilaritySearch.kmeansFit(df, k = 2, maxIters = 10)
    assert(cb.size == 2)
    // each centroid is dominated by exactly one of the two axes
    val axes = cb.map(c => if (c(0) > c(2)) 0 else 2).toSet
    assert(axes == Set(0, 2), s"centroids collapsed: $cb")
    // converged: near-zero final inertia relative to corpus size
    assert(trace.last < 1.0, s"trace=$trace")
  }

  test("kmeans inertia is Lloyd-monotone and centroids stay unit-norm") {
    val emb = Tables.embeddings(spark, sf)
    val (cb, trace) = SimilaritySearch.kmeansFit(emb, k = 8, maxIters = 6,
      tol = 0.0) // tol=0: run all 6 rounds, exercise the full trace
    assert(trace.size == 6)
    trace.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"inertia rose: $trace")
    }
    cb.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"non-unit centroid norm $n")
    }
    // determinism: the same seed reproduces the same fit bit-for-bit
    val (cb2, trace2) = SimilaritySearch.kmeansFit(emb, k = 8, maxIters = 6,
      tol = 0.0)
    assert(cb == cb2 && trace == trace2)
  }

  test("mipsTopK ranks by magnitude where cosine cannot") {
    // same direction, different lengths: MIPS must put the LONG vector
    // first even though cosine ties them; an orthogonal vector scores 0
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f), 0),   // query
      (1L, Seq(2.0f, 0.0f), 0),   // ip 2
      (2L, Seq(9.0f, 0.0f), 0),   // ip 9 — must rank first
      (3L, Seq(0.0f, 5.0f), 0))   // ip 0
      .toDF("vec_id", "embedding", "label")
    val out = SimilaritySearch.mipsTopK(rows, 0L, 3).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 1L, 3L))
    assert(out.map(_.getDouble(1)).toSeq == Seq(9.0, 2.0, 0.0))
  }

  test("kmeansClusters profile partitions the corpus; cohesion in [-1, 1]") {
    val emb = Tables.embeddings(spark, sf)
    val prof = SimilaritySearch.kmeansClusters(emb, k = 4).collect()
    assert(prof.map(_.getAs[Long]("n")).sum == emb.count())
    prof.foreach { r =>
      val c = r.getAs[Double]("avg_cos")
      assert(c >= -1.0 && c <= 1.0 + 1e-9)
      assert(r.getAs[Int]("n_iters") >= 1)
    }
    // corpus smaller than k: codebook shrinks, no phantom cells
    val tiny = Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val (cbTiny, _) = SimilaritySearch.kmeansFit(tiny, k = 5)
    assert(cbTiny.size == 2)
  }

  test("kmeansExactClusters: planted cones separate; partitioning-invariant") {
    // two tight cones around orthogonal axes — the exact variant must
    // recover the same grouping the float fit does, with avg_cos ≈ 1
    val rows =
      (0 until 10).map(i => (i.toLong,
        Seq(10.0f, (i % 3) * 0.1f, 0.0f), 0)) ++
      (0 until 10).map(i => (100L + i,
        Seq(0.0f, (i % 3) * 0.1f, 10.0f), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val prof = SimilaritySearch.kmeansExactClusters(df, k = 2).collect()
    assert(prof.map(_.getAs[Long]("n")).sum == 20L)
    assert(prof.forall(_.getAs[Double]("avg_cos") > 0.99),
      s"cones not tight: ${prof.mkString(",")}")
    // engine-exactness claim: ANY partitioning produces identical rows
    // (all cross-row arithmetic is integer — nothing float-order-dependent)
    val emb = Tables.embeddings(spark, sf)
    val a = SimilaritySearch.kmeansExactClusters(emb, k = 8).collect().toSeq
    val b = SimilaritySearch.kmeansExactClusters(emb.repartition(13), k = 8)
      .collect().toSeq
    assert(a == b, "exact k-means drifted under repartitioning")
    assert(a.map(_.getAs[Long]("n")).sum == emb.count())
  }

  test("kmeansExactPurity: orthogonal label-aligned cones score purity " +
      "1.0 with the right majority label") {
    import spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // seed order is (md5(vec_id), vec_id): put the FIRST two seeds in
    // different groups so k=2 starts with one centroid per cone
    val ids = (1L to 8L).sortBy(i => (md5hex(i.toString), i))
    val groupA = Set(ids(0)) ++ ids.drop(2).take(3)
    val rows = (1L to 8L).map { i =>
      if (groupA(i)) (i, Seq(1.0, 0.0), 7L) else (i, Seq(0.0, 1.0), 3L)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = SimilaritySearch.kmeansExactPurity(emb, k = 2).collect()
    assert(out.length == 2, out.mkString(","))
    assert(out.forall(_.getAs[Double]("purity") == 1.0),
      out.mkString(","))
    assert(out.map(r => (r.getAs[Long]("n"),
      r.getAs[Long]("top_label"))).toSet == Set((4L, 7L), (4L, 3L)),
      out.mkString(","))
  }

  test("isotropyAudit: parallel vectors score mean cosine exactly 1, " +
      "a balanced cross cancels to -1/(n-1), orthogonal groups 1/3") {
    import spark.implicits._
    def emb(vs: Seq[Seq[Double]]) = vs.zipWithIndex
      .map { case (v, i) => (i.toLong, v, 0L) }
      .toDF("vec_id", "embedding", "label")
    val same = SimilaritySearch.isotropyAudit(
      emb(Seq.fill(4)(Seq(1.0, 0.0)))).collect().head
    assert(same.getAs[Long]("n") == 4L && same.getAs[Long]("dim") == 2L,
      s"$same")
    assert(same.getAs[Double]("avg_pair_cos") == 1.0, s"$same")
    assert(same.getAs[Double]("max_dim_mean") == 1.0, s"$same")
    // two orthogonal groups of two: 4 of 12 ordered pairs at cos 1
    val ortho = SimilaritySearch.isotropyAudit(
      emb(Seq(Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0),
        Seq(0.0, 1.0)))).collect().head
    assert(ortho.getAs[Double]("avg_pair_cos") == 0.333333, s"$ortho")
    // a perfectly balanced cross: the sum vector vanishes, so the
    // mean pairwise cosine hits its floor -self/(n(n-1)) = -1/3
    val cross = SimilaritySearch.isotropyAudit(
      emb(Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0), Seq(0.0, 1.0),
        Seq(0.0, -1.0)))).collect().head
    assert(cross.getAs[Double]("avg_pair_cos") == -0.333333, s"$cross")
    assert(cross.getAs[Double]("max_dim_mean") == 0.0, s"$cross")
  }

  test("l2TopK: exact integer squared distances rank magnitude the " +
      "cosine family ignores; distance ties break on vec_id") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 2.0)),
      (3L, Seq(3.0, 0.0)), (4L, Seq(1.0, 1.0)), (5L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val out = SimilaritySearch.l2TopK(emb, 0L, 4).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("d2q"))).toSeq
    // d2 in 1e-3-lattice units: (1,0)->1e6 ties (0,1)->1e6, id order
    assert(out == Seq((1L, 1000000L), (5L, 1000000L), (4L, 2000000L),
      (2L, 4000000L)), s"$out")
  }
}
