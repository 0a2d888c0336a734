package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Product-quantization ANN — the compressed-domain scale path.
  *
  * IVF/LSH prune WHICH vectors a probe scans; PQ shrinks WHAT is
  * scanned: each vector is cut into `m` subvectors, each quantized to
  * one of `ksub` per-subspace centroids, so a dim-float vector becomes
  * m small codes (dim=64 floats = 256 B → 8 codes ≈ 8 B, 32×). The
  * probe scans the CODE lake only — asymmetric distance computation
  * (ADC) scores a candidate by summing per-subspace dot tables built
  * once per query from the uncompressed query vector — then reranks a
  * small candidate set against true embeddings. At 100 TB the ADC scan
  * touches 1/32 of the bytes a raw scan would, and composes with the
  * IVF cell layout (scan codes of nProbe cells only).
  *
  * Codebooks are trained on a DETERMINISTIC seeded sample driver-side —
  * the standard regime (sub-quantizer training needs ~10⁴-10⁵ points
  * regardless of corpus size; FAISS does the same) — so training cost
  * is corpus-size-independent and re-runs are bit-identical.
  */
object ProductQuantization {

  /** Per-subspace codebooks: m × ksub × (dim/m), trained by seeded-
    * sample Lloyd iterations under L2 (the PQ objective). Deterministic:
    * sample = first `sampleN` vectors by salted hash order; init = the
    * ksub hash-first distinct subvectors; fixed `iters` rounds. */
  def trainCodebooks(embeddings: DataFrame, m: Int, ksub: Int,
                     sampleN: Int = 2048, iters: Int = 5,
                     seed: Long = 42L): Seq[Seq[Seq[Double]]] = {
    val sample = embeddings
      .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
      .limit(sampleN)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train PQ codebooks on an empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    (0 until m).map { j =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      kmeans(subs, ksub, iters)
    }
  }

  /** Plain Lloyd iterations with deterministic first-distinct init;
    * empty cells keep their previous centroid. Runs on the driver over
    * the (tiny) training sample only.
    *
    * Always returns EXACTLY `k` centroids: when the sample has fewer
    * than `k` distinct subvectors, the trained centroids are cycled to
    * pad the tail. Duplicated entries are harmless — encode's argmax
    * picks the first occurrence — and the uniform size is load-bearing:
    * pqTopK's flattened ADC/norm tables index with stride `ksub`, so a
    * ragged codebook would shift every later subspace's offsets. */
  private def kmeans(points: Array[Array[Double]], k: Int,
                     iters: Int): Seq[Seq[Double]] = {
    // cheap invariant: with zero points the padding below
    // (Iterator.continually(trained).flatten) would spin forever —
    // fail loudly instead (trainCodebooks already guarantees non-empty,
    // this guards future direct callers)
    require(points.nonEmpty, "kmeans requires a non-empty sample")
    val init = points.distinctBy(_.toSeq).take(k)
    var centroids = init.map(_.clone)
    val kEff = centroids.length
    for (_ <- 0 until iters) {
      val sums = Array.fill(kEff)(new Array[Double](points.head.length))
      val counts = new Array[Long](kEff)
      points.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kEff) {
          var d = 0.0; var i = 0
          while (i < p.length) { val t = p(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < p.length) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else sums(c).map(_ / counts(c))
      }
    }
    val trained = centroids.map(_.toIndexedSeq).toIndexedSeq
    if (trained.length >= k) trained
    else trained ++ Iterator.continually(trained).flatten.take(k - trained.length)
  }

  /** Row-local PQ encoding: per subspace, the L2-nearest sub-centroid's
    * id — argmin ‖x−c‖² computed as argmax (x·c − ‖c‖²/2), so each
    * subspace is a fixed array of codegen'd dot products over ONE
    * hoisted slice. Zero shuffle; one pass. */
  def encode(embeddings: DataFrame,
             codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = codebooks.size
    val dsub = codebooks.head.head.size
    val withSubs = (0 until m).foldLeft(embeddings) { (df, j) =>
      df.withColumn(s"__s$j", slice(col("embedding"), j * dsub + 1, dsub))
    }
    val codeCols: Seq[Column] = (0 until m).map { j =>
      val scores = array(codebooks(j).map { c =>
        dot(col(s"__s$j"), array(c.map(lit): _*)) -
          lit(c.map(x => x * x).sum / 2.0)
      }: _*)
      (array_position(scores, array_max(scores)) - 1).cast("int")
    }
    withSubs.select(col("vec_id"), array(codeCols: _*).as("code"))
  }

  /** One-off PQ index build: train (seeded sample), encode the corpus,
    * land the code lake. The lake rows are (vec_id, code[m]) — the 32×
    * smaller scan target every probe reads. */
  def buildPqIndex(embeddings: DataFrame, m: Int, ksub: Int,
                   lakePath: String, seed: Long = 42L): Seq[Seq[Seq[Double]]] = {
    val cbs = trainCodebooks(embeddings, m, ksub, seed = seed)
    encode(Scale.fanOut(embeddings, Seq("vec_id")), cbs)
      .write.mode(SaveMode.Overwrite).parquet(lakePath)
    cbs
  }

  /** ADC top-k probe with exact rerank: score every code row by the
    * query's per-subspace dot tables (pure literal-array lookups — the
    * probe never touches stored embeddings), take the `rerank` best
    * approximate candidates (TakeOrdered — no shuffle), then join ONLY
    * those back to true embeddings for exact cosine and the final k.
    *
    * The only driver-side value is the query vector itself (a dim-float
    * parameter fetch, the same contract as lshProbe's bucket lookup).
    * Approximation quality is the m/ksub trade; the rerank stage makes
    * top-k exact GIVEN the candidate set — recall is property-tested
    * against bruteForceTopK. */
  def pqTopK(spark: SparkSession, lakePath: String, embeddings: DataFrame,
             queryId: Long, k: Int, codebooks: Seq[Seq[Seq[Double]]],
             rerank: Int = 50): DataFrame = {
    val m = codebooks.size
    val ksub = codebooks.head.size
    require(codebooks.forall(_.size == ksub),
      "ragged codebooks would corrupt the stride-ksub ADC table offsets")
    val dsub = codebooks.head.head.size
    val qRow = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").cast("array<double>")).head(1)
    if (qRow.isEmpty)
      return embeddings.filter(lit(false))
        .select(col("vec_id"), lit(0.0).as("cos"))
    val q = qRow.head.getSeq[Double](0)
    // per-query ADC tables: dot(q_j, c) and ‖c‖² for every sub-centroid
    val adc = for (j <- 0 until m; c <- codebooks(j))
      yield (0 until dsub).map(i => q(j * dsub + i) * c(i)).sum
    val cn2 = for (j <- 0 until m; c <- codebooks(j))
      yield c.map(x => x * x).sum
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val adcArr = array(adc.map(lit): _*)
    val cn2Arr = array(cn2.map(lit): _*)
    def tableSum(tbl: Column): Column =
      aggregate(
        transform(sequence(lit(0), lit(m - 1)), j =>
          element_at(tbl, j * ksub + element_at(col("code"), j + 1) + 1)),
        lit(0.0), (acc, x) => acc + x)
    val approx = spark.read.parquet(lakePath)
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        (tableSum(adcArr) /
          (lit(qNorm) * sqrt(tableSum(cn2Arr)))).as("approx_cos"))
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
