package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
    // round-robin fan-out (no hash shuffle): spreads the map-side cosine
    // over all cores on single-split inputs; no-op on a real multi-split
    // corpus, where the scan is already wide
    Scale.fanOut(embeddings)
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

  /** ANN top-k over a bucket-PARTITIONED lake layout: the one-off write
    * lays vectors out hive-partitioned by LSH bucket, and the probe's
    * literal bucket predicate becomes a PartitionFilter — the scan reads
    * ONE directory, not the corpus (asserted in PlanAuditSpec). The only
    * driver-side action is the one-scalar bucket lookup for the query
    * vector (a parameter fetch, not a data loop); the query embedding
    * itself stays a broadcast 1-row frame. Same output as lshTopK. */
  def lshTopKPruned(spark: SparkSession, embeddings: DataFrame, queryId: Long,
                    k: Int, planes: Seq[Seq[Double]], lakePath: String): DataFrame = {
    val bucketed = withLshBucket(embeddings, planes)
    bucketed.write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(lakePath)
    val q = bucketed.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"), col("bucket"))
    // missing query id → empty result (same contract as lshTopK), not a
    // head()-on-empty crash
    val qBucketRow = q.select("bucket").head(1)
    if (qBucketRow.isEmpty)
      return spark.read.parquet(lakePath).filter(lit(false))
        .select(col("vec_id"), lit(0.0).as("cos"), col("bucket"))
    val qBucket = qBucketRow.head.getLong(0)
    spark.read.parquet(lakePath)
      .filter(col("bucket") === qBucket && col("vec_id") =!= queryId)
      .crossJoin(broadcast(q.select(col("q_embedding"))))
      .withColumn("cos", round(cosine(col("embedding"), col("q_embedding")), 4))
      .orderBy(desc("cos"), asc("vec_id"))
      .select(col("vec_id"), col("cos"), col("bucket"))
      .limit(k)
  }

  /** IVF coarse codebook: k deterministic seed vectors (top-k by a
    * seeded hash of vec_id — one TakeOrdered pass, no Math.random)
    * refined by ONE distributed Lloyd round under cosine (assign every
    * vector to its max-dot unit centroid, then per-dimension mean per
    * cell), then unit-normalized. Cells left empty by the refinement
    * keep their seed. The codebook is k×dim — small by construction —
    * so it lives driver-side and is embedded as literals, the same
    * pattern as the LSH planes. The two passes over the corpus are a
    * one-off index build, not per-query cost. */
  def ivfCodebook(embeddings: DataFrame, k: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    def unit(v: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    val unitSeeds = embeddings
      .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
      .limit(k)
      .select(col("embedding").cast("array<double>"))
      .collect().map(r => unit(r.getSeq[Double](0).toVector)).toVector
    // corpus smaller than k → a smaller codebook, not phantom cells
    val kEff = unitSeeds.size
    // one Lloyd round: per-cell per-dimension mean via posexplode —
    // a single shuffle of (cell, pos) keyed scalars, k×dim result rows
    val means = embeddings
      .select(nearestCentroidId(col("embedding"), unitSeeds).as("cell"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg("x").as("m"))
      .collect()
    val byCell = means.groupBy(_.getInt(0))
    (0 until kEff).map { c =>
      byCell.get(c) match {
        case Some(rows) => unit(rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toVector)
        case None       => unitSeeds(c)
      }
    }
  }

  /** IVF ANN top-k: every corpus vector is assigned to its codebook
    * cell; the probe ranks cells by dot against the query and scans only
    * the `nProbe` nearest — the scan prunes to ~nProbe/k of the corpus
    * (at 100 TB the cell id becomes the partition key, the same layout
    * trick as lshTopKPruned). The probe's cell ranking is computed
    * declaratively on the broadcast 1-row query frame — no driver-side
    * math. Recall vs brute force is property-tested. */
  def ivfTopK(embeddings: DataFrame, queryId: Long, k: Int,
              codebook: Seq[Seq[Double]], nProbe: Int = 4): DataFrame = {
    // coalesce makes `cell` non-nullable, so the isnotnull(cell)
    // constraint the probe filter implies folds to true instead of
    // re-evaluating the assignment below the fan-out exchange (same
    // inferred-filter double-compute the shingle pipeline hit); a null
    // embedding lands in cell -1, which no probe ever selects
    val assigned = Scale.fanOut(embeddings, Seq("vec_id"))
      .withColumn("cell",
        coalesce(nearestCentroidId(col("embedding"), codebook), lit(-1)))
    val q = assigned.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"),
        topCentroidIds(col("embedding"), codebook, nProbe).as("q_cells"))
    assigned
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryId && array_contains(col("q_cells"), col("cell")))
      .withColumn("cos", round(cosine(col("embedding"), col("q_embedding")), 4))
      .orderBy(desc("cos"), asc("vec_id"))
      .select(col("vec_id"), col("cos"), col("cell"))
      .limit(k)
  }

  /** Near-dup PAIRS via multi-table hyperplane LSH — the scale twin of
    * Dedup.embeddingNearDupPairs (which is an O(n²) BroadcastNestedLoop
    * all-pairs by contract). `nTables` independent tables of `nPlanes`
    * sign bits each; candidates are equi-join matches on (table, bucket),
    * deduped row-locally by the first-agreeing-table predicate (no
    * distinct() shuffle), then verified by exact cosine ≥ threshold.
    *
    * Recall for a pair at angle θ is 1-(1-(1-θ/π)^nPlanes)^nTables —
    * deterministic given the seeded planes, property-tested against the
    * exact operator. The defaults (16×4) target the synthetic corpus'
    * cos≈0.3 near-dup regime (θ≈72°); a production corpus deduped at
    * cos≥0.9 wants fewer, deeper tables (e.g. 8×8), which also shrinks
    * the candidate set — tune per threshold. Embeddings+norms ride the
    * band shuffle so verification is row-local (no join-back); at 100 TB
    * that trades ~nTables× shuffle width for two fewer corpus joins. */
  def neardupPairsLsh(embeddings: DataFrame, threshold: Double,
                      nTables: Int = 16, nPlanes: Int = 4, dim: Int = 64,
                      seed: Long = 42L): DataFrame = {
    val allPlanes = seededPlanes(nTables * nPlanes, dim, seed)
    val withBuckets = Scale.fanOut(embeddings, Seq("vec_id"))
      .select(col("vec_id"), col("embedding"),
        l2Norm(col("embedding")).as("nrm"),
        hyperplaneBucketsNative(col("embedding"), allPlanes, nPlanes).as("bks"))
    val banded = withBuckets.select(
      col("vec_id"), col("embedding"), col("nrm"), col("bks"),
      posexplode(col("bks")).as(Seq("tbl", "bucket")))
    Scale.bandJoinFirstAgree(banded, "vec_id", band = "tbl", key = "bucket")
      .select(col("x.vec_id").as("v1"), col("y.vec_id").as("v2"),
        round(dot(col("x.embedding"), col("y.embedding")) /
          (col("x.nrm") * col("y.nrm")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
