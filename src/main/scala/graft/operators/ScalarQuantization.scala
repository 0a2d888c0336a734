package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization ANN — the simplest compressed-domain
  * scale path, complementing PQ: each dimension is affinely mapped to
  * an 8-bit code against per-dimension [min, max] bounds, so a
  * 64-float vector (256 B) becomes 64 bytes (4×) with NO codebook at
  * probe time — the asymmetric score is a single weighted sum over the
  * code array, friendlier to whole-stage codegen than PQ's table
  * lookups. Where PQ wins on compression (16 B here), SQ8 wins on
  * accuracy per scan byte and probe simplicity; FAISS ships both for
  * the same reason.
  *
  * Bounds are trained on a DETERMINISTIC seeded sample (the same
  * regime as PQ codebooks: per-dim ranges need thousands of points
  * regardless of corpus size), padded 1% so out-of-sample values clamp
  * at the rail instead of folding. The exact vector norm is stored
  * beside the codes at encode time (8 B), so approximate cosine uses
  * the true denominator and the approximation error lives only in the
  * dot product.
  */
object ScalarQuantization {

  /** Per-dimension [min, max] from a seeded deterministic sample,
    * padded by 1% of the range (zero-range dims get an epsilon so the
    * quantization step is never 0). */
  def trainBounds(embeddings: DataFrame, sampleN: Int = 2048,
                  seed: Long = 42L): (Seq[Double], Seq[Double]) = {
    val sample = embeddings
      .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
      .limit(sampleN)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train SQ8 bounds on an empty corpus")
    val dim = sample.head.length
    val mn = Array.fill(dim)(Double.MaxValue)
    val mx = Array.fill(dim)(Double.MinValue)
    sample.foreach { v =>
      var i = 0
      while (i < dim) {
        if (v(i) < mn(i)) mn(i) = v(i)
        if (v(i) > mx(i)) mx(i) = v(i)
        i += 1
      }
    }
    (0 until dim).foreach { i =>
      val r = math.max(mx(i) - mn(i), 1e-9)
      mn(i) -= 0.01 * r
      mx(i) += 0.01 * r
    }
    (mn.toSeq, mx.toSeq)
  }

  /** Row-local SQ8 encode: code_i = round((x_i − mn_i)/Δ_i) clamped to
    * [0, 255], plus the EXACT vector norm. Pure nested zip_with over
    * literal bound arrays — zero shuffle, one pass, codegen'd. */
  def encode(embeddings: DataFrame,
             mn: Seq[Double], mx: Seq[Double]): DataFrame = {
    val mnArr = array(mn.map(lit): _*)
    val stepArr = array(mn.indices.map(i =>
      lit((mx(i) - mn(i)) / 255.0)): _*)
    val codes = zip_with(
      zip_with(col("embedding").cast("array<double>"), mnArr,
        (x, m) => x - m),
      stepArr,
      (d, s) => least(greatest(round(d / s), lit(0.0)), lit(255.0))
        .cast("int"))
    embeddings.select(col("vec_id"), codes.as("code"),
      sqrt(aggregate(col("embedding").cast("array<double>"),
        lit(0.0), (acc, x) => acc + x * x)).as("norm"))
  }

  /** One-off SQ8 index build: train bounds, encode the corpus, land the
    * (vec_id, code[dim], norm) lake — the 4×-smaller scan target. */
  def buildSq8Index(embeddings: DataFrame,
                    lakePath: String): (Seq[Double], Seq[Double]) = {
    val (mn, mx) = trainBounds(embeddings)
    encode(Scale.fanOut(embeddings, Seq("vec_id")), mn, mx)
      .write.mode(SaveMode.Overwrite).parquet(lakePath)
    (mn, mx)
  }

  /** Asymmetric top-k probe with exact rerank, mirroring pqTopK's
    * contract: dot(q, x̂) decomposes as Σq_i·mn_i (a driver scalar) +
    * Σ(q_i·Δ_i)·c_i (one weighted sum over the code array against a
    * literal weight vector), so the scan touches ONLY the code lake;
    * the stored exact norm feeds the denominator. TakeOrdered bounds
    * the shortlist; only `rerank` candidates join true embeddings for
    * the exact final k. */
  def sq8TopK(spark: SparkSession, lakePath: String, embeddings: DataFrame,
              queryId: Long, k: Int, mn: Seq[Double], mx: Seq[Double],
              rerank: Int = 50): DataFrame = {
    val qRow = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").cast("array<double>")).head(1)
    if (qRow.isEmpty)
      return embeddings.filter(lit(false))
        .select(col("vec_id"), lit(0.0).as("cos"))
    val q = qRow.head.getSeq[Double](0)
    val dotConst = q.indices.map(i => q(i) * mn(i)).sum
    val wArr = array(q.indices.map(i =>
      lit(q(i) * (mx(i) - mn(i)) / 255.0)): _*)
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val codeDot: Column = aggregate(
      zip_with(col("code"), wArr, (c, w) => c * w),
      lit(0.0), (acc, x) => acc + x)
    val approx = spark.read.parquet(lakePath)
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        ((codeDot + lit(dotConst)) / (lit(qNorm) * col("norm")))
          .as("approx_cos"))
      .orderBy(desc("approx_cos"), asc("vec_id"))
      .limit(rerank)
    approx
      .join(embeddings.select(col("vec_id"), col("embedding")), "vec_id")
      .crossJoin(broadcast(embeddings.filter(col("vec_id") === queryId)
        .select(col("embedding").as("q_embedding"))))
      .withColumn("cos", round(cosine(col("embedding"), col("q_embedding")), 4))
      .orderBy(desc("cos"), asc("vec_id"))
      .select(col("vec_id"), col("cos"))
      .limit(k)
  }
}
