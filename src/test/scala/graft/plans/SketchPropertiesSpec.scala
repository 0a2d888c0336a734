package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Statistical properties of the sketch expressions on GENERATED data
  * (ScalaCheck generators, fixed seed → deterministic): the planted
  * near-dups in the test corpus only cover one overlap regime; these
  * cover the dial from disjoint to identical. */
class SketchPropertiesSpec extends SparkSpec {

  private val K = 64
  private val vocab = (0 until 500).map(i => s"tok$i")

  /** n generated set pairs with overlap ratios spread over [0,1]. */
  private def genPairs(n: Int): Seq[(Seq[String], Seq[String])] = {
    val g = for {
      size <- Gen.choose(20, 120)
      overlap <- Gen.choose(0.0, 1.0)
      base <- Gen.pick(size, vocab)
    } yield {
      val keep = (size * overlap).toInt
      val other = vocab.filterNot(base.contains).take(size - keep)
      (base.toSeq, base.take(keep).toSeq ++ other)
    }
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
  }

  test("minhash slot-agreement concentrates around true jaccard") {
    import spark.implicits._
    val cases = genPairs(40)
    val df = cases.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "ta", "tb")
    val sig = (c: String) => ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(col(c)), K))
    val est = df
      .withColumn("sa", sig("ta")).withColumn("sb", sig("tb"))
      .withColumn("agree", aggregate(
        zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).cast("double") / K)
      .select("id", "agree").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      val sa = a.toSet; val sb = b.toSet
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      val sigma = math.sqrt(j * (1 - j) / K)
      assert(math.abs(est(i.toLong) - j) <= 5 * sigma + 2.0 / K,
        s"case $i: est ${est(i.toLong)} vs true $j")
    }
  }

  test("simhash hamming is symmetric, zero on identity, monotone-ish in overlap") {
    import spark.implicits._
    val cases = genPairs(40)
    val df = cases.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "ta", "tb")
    val sh = (c: String) => ColumnBridge.column(
      SimHash64(ColumnBridge.expression(col(c))))
    val rows = df
      .select(col("id"),
        bit_count(sh("ta").bitwiseXOR(sh("tb"))).as("h_ab"),
        bit_count(sh("tb").bitwiseXOR(sh("ta"))).as("h_ba"),
        bit_count(sh("ta").bitwiseXOR(sh("ta"))).as("h_aa"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("h_ab") == r.getAs[Int]("h_ba"))
      assert(r.getAs[Int]("h_aa") == 0)
    }
    // identical sets (overlap 1.0) must give hamming 0 via the identity check;
    // near-disjoint pairs should average clearly above near-identical ones
    val hams = cases.zipWithIndex.map { case ((a, b), i) =>
      val sa = a.toSet; val sb = b.toSet
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      (j, rows.find(_.getLong(0) == i.toLong).get.getAs[Int]("h_ab"))
    }
    val low = hams.filter(_._1 < 0.3).map(_._2)
    val high = hams.filter(_._1 > 0.7).map(_._2)
    if (low.nonEmpty && high.nonEmpty)
      assert(high.sum.toDouble / high.size < low.sum.toDouble / low.size)
  }

  test("native ShingleHashes equals xxhash64 over the string shingle pipeline") {
    import graft.Tables
    import graft.functions.TextFunctions.shingles
    val docs = Tables.documents(spark, sf)
    val viaStrings = docs
      .select(col("doc_id"), explode(shingles(col("text"), 3)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .groupBy("doc_id").agg(sort_array(collect_set(col("h"))).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = docs
      .select(col("doc_id"),
        ColumnBridge.column(ShingleHashes(
          ColumnBridge.expression(col("text")), 3)).as("hs"))
      .filter(size(col("hs")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.nonEmpty)
    assert(native == viaStrings)
  }

  test("native NearestCentroid equals the Column-composed argmax of dots") {
    import graft.Tables
    import graft.functions.VectorFunctions.{nearestCentroidId, nearestCentroidIdCols, topCentroidIds}
    val emb = Tables.embeddings(spark, sf)
    val cb = graft.operators.SimilaritySearch.ivfCodebook(emb, 16)
    val both = emb.select(col("vec_id"),
        nearestCentroidId(col("embedding"), cb).as("nat"),
        nearestCentroidIdCols(col("embedding"), cb).as("ref"),
        topCentroidIds(col("embedding"), cb, 4).as("top"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"vec ${r.getLong(0)}: native ${r.getInt(1)} != composed ${r.getInt(2)}")
      // the assigned cell is the head of the probe ranking
      assert(r.getSeq[Int](3).head == r.getInt(1))
      assert(r.getSeq[Int](3).size == 4)
    }
  }

  test("native HyperplaneBuckets equals the composed per-table bucket pipeline") {
    import graft.Tables
    import graft.functions.VectorFunctions.{hyperplaneBucket, hyperplaneBucketsNative}
    import graft.operators.SimilaritySearch.seededPlanes
    val emb = Tables.embeddings(spark, sf)
    val planes = seededPlanes(16 * 4, 64)
    val composed = array((0 until 16).map(t =>
      hyperplaneBucket(col("embedding"), planes.slice(t * 4, (t + 1) * 4))): _*)
    val rows = emb.select(col("vec_id"),
        hyperplaneBucketsNative(col("embedding"), planes, 4).as("nat"),
        composed.as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"vec ${r.getLong(0)}: native buckets != composed buckets")
    }
  }

  test("dot product is bilinear within FP tolerance") {
    import spark.implicits._
    val vecs = (0 until 20).map { i =>
      val r = new scala.util.Random(i)
      (Array.fill(32)(r.nextDouble() - 0.5),
        Array.fill(32)(r.nextDouble() - 0.5),
        Array.fill(32)(r.nextDouble() - 0.5))
    }
    val df = vecs.toDF("a", "b", "c")
    import graft.functions.VectorFunctions.dot
    val out = df.select(
      (dot(zip_with(col("a"), col("b"), (x, y) => x + y), col("c")) -
        (dot(col("a"), col("c")) + dot(col("b"), col("c")))).as("resid"))
      .collect().map(_.getDouble(0))
    out.foreach(r => assert(math.abs(r) < 1e-9))
  }
}
