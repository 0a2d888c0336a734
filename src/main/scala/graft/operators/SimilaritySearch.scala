package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2.G).
  *
  * Brute-force is the correctness baseline and is already the right
  * shape for scale: the query point is broadcast (1-row cross join), the
  * scan computes cosine map-side, and top-k is TakeOrderedAndProject
  * (per-partition heaps + driver merge) — no shuffle of the corpus.
  * The LSH variant buckets vectors by random-hyperplane signs so the
  * probe only scans matching buckets — the 100 TB path, validated
  * against brute force in the specs.
  */
object SimilaritySearch {

  /** Exact top-k by cosine against one query vector (given as the row of
    * `queryId`). Tie-break on rounded cosine then vec_id keeps the
    * result reproducible. */
  def bruteForceTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    embeddings
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", round(cosine(col("embedding"), col("q_embedding")), 4))
      .orderBy(desc("cos"), asc("vec_id"))
      .select(col("vec_id"), col("cos"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed → reproducible
    * bucketing without Math.random). */
  def seededPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Assign every vector an LSH bucket id from hyperplane sign bits. */
  def withLshBucket(embeddings: DataFrame, planes: Seq[Seq[Double]]): DataFrame =
    embeddings.withColumn("bucket", hyperplaneBucket(col("embedding"), planes))

  /** ANN top-k: scan only the query's bucket (plus optionally hamming-1
    * neighbor buckets for recall). Recall vs brute force is property-
    * tested; at 100 TB the bucket column is the partition/cluster key so
    * a probe touches a fraction of the corpus. */
  def lshTopK(embeddings: DataFrame, queryId: Long, k: Int,
              planes: Seq[Seq[Double]]): DataFrame = {
    val bucketed = withLshBucket(embeddings, planes)
    val q = bucketed.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"), col("bucket").as("q_bucket"))
    bucketed
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryId && col("bucket") === col("q_bucket"))
      .withColumn("cos", round(cosine(col("embedding"), col("q_embedding")), 4))
      .orderBy(desc("cos"), asc("vec_id"))
      .select(col("vec_id"), col("cos"), col("bucket"))
      .limit(k)
  }
}
