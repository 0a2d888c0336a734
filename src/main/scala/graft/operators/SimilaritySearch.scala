package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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
  def bruteForceTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame =
    bruteForceTopKWhere(embeddings, queryId, k, lit(true))

  /** Hybrid retrieval — reciprocal-rank fusion of the vector shortlist
    * and a BM25 keyword shortlist (score = Σ 1/(kRrf + rank), the
    * score-scale-free fusion every hybrid search stack defaults to;
    * docs and vectors pair by shared id). Both shortlists are
    * `shortlist`-sized (TakeOrdered on their own side — the corpus is
    * scanned once per modality and never joined wholesale), so the rank
    * windows and the full-outer fusion join run on k-sized frames.
    * Deterministic: ranks tie-break on id in both modalities, fusion
    * ties break on id. */
  def hybridRrf(documents: DataFrame, embeddings: DataFrame,
                queryVecId: Long, queryTerms: Seq[String], k: Int = 10,
                shortlist: Int = 100, kRrf: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vr = bruteForceTopK(embeddings, queryVecId, shortlist)
      .withColumn("rv", row_number().over(
        Window.orderBy(desc("cos"), asc("vec_id"))))
    val br = graft.operators.TextAnalysis
      .bm25TopK(documents, queryTerms, shortlist)
      .withColumn("rb", row_number().over(
        Window.orderBy(desc("bm25"), asc("doc_id"))))
    vr.join(br, vr("vec_id") === br("doc_id"), "full_outer")
      .select(coalesce(col("vec_id"), col("doc_id")).as("id"),
        round(coalesce(lit(1.0) / (lit(kRrf) + col("rv")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("rb")), lit(0.0)), 6)
          .as("rrf"))
      .orderBy(desc("rrf"), asc("id")).limit(k)
  }

  /** Metadata-FILTERED exact vector search: top-k by cosine among only
    * the corpus rows satisfying `pred` (e.g. label = 3) — the "search
    * within a slice" query every vector store serves. The predicate sits
    * directly on the scan, so for a stored corpus it reaches the parquet
    * reader as a pushed filter (plan-audited): selective slices read a
    * fraction of the corpus BEFORE any cosine is computed, and top-k
    * stays TakeOrderedAndProject — per-partition heaps, no shuffle. */
  def bruteForceTopKWhere(embeddings: DataFrame, queryId: Long, k: Int,
                          pred: Column): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    // round-robin fan-out (no hash shuffle): spreads the map-side cosine
    // over all cores on single-split inputs; no-op on a real multi-split
    // corpus, where the scan is already wide
    Scale.fanOut(embeddings.filter(pred))
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", round(cosine(col("embedding"), col("q_embedding")), 4))
      .orderBy(desc("cos"), asc("vec_id"))
      .select(col("vec_id"), col("cos"))
      .limit(k)
  }

  /** EXACT squared-EUCLIDEAN brute-force top-k — the metric the cosine
    * family deliberately ignores MAGNITUDE of ([[bruteForceTopK]]
    * ranks by angle; L2 ranks by position, the right metric when
    * vector length carries signal — unnormalized counts, coordinates,
    * calibrated feature spaces): d² = Σ(qᵢ−pᵢ)² on the 1e-3 integer
    * lattice, an EXACT long per pair (dim·(2·max_coord·1000)² stays
    * far under int64), so the (d², vec_id) ordering is bit-identical
    * on any engine/partitioning — no float-rank flapping at the k
    * boundary, which cosine surfaces buy with round-4.
    *
    * Lattice quantization uses the explicit floor convention
    * (floor(x·1000 + 0.5), spelled identically in the oracle) — NOT
    * engine round(): round's half-case tie-break differs across
    * engines/versions, while floor of the same IEEE expression is
    * bit-identical everywhere (the sp_variogram lesson, SURVEY §8.6).
    *
    * Same scan shape as [[bruteForceTopK]]: fanned map-side distance
    * against a 1-row broadcast query, TakeOrderedAndProject top-k —
    * per-partition heaps, no shuffle. Distances report in lattice
    * units (1e6·true d², documented contract). */
  def l2TopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    def lat(c: Column) = transform(c.cast("array<double>"),
      x => floor(x * 1000 + 0.5).cast("long"))
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(lat(col("embedding")).as("qq"))
    Scale.fanOut(embeddings)
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), lat(col("embedding")).as("p"))
      .crossJoin(broadcast(q))
      .withColumn("d2q", aggregate(
        zip_with(col("p"), col("qq"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
      .orderBy(asc("d2q"), asc("vec_id"))
      .select(col("vec_id"), col("d2q"))
      .limit(k)
  }

  /** Cosine RANGE search — every corpus vector above a similarity
    * floor, not a fixed k (the dedup/recall-sweep companion of top-k:
    * "give me ALL near matches"). Same scan shape as bruteForceTopK
    * (fanned map-side cosine, 1-row query broadcast) but the selection
    * is a codegen'd filter on the rounded score — output size is the
    * true neighbor count, and no global ordering is needed at all. */
  def rangeSearch(embeddings: DataFrame, queryId: Long,
                  tau: Double): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    Scale.fanOut(embeddings)
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", round(cosine(col("embedding"), col("q_embedding")), 4))
      .filter(col("cos") >= tau)
      .select(col("vec_id"), col("cos"))
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

  /** One-off LSH index build: lay the corpus out hive-partitioned by
    * LSH bucket. Probes against this lake partition-prune to single
    * bucket directories. Build cost is paid ONCE per corpus version —
    * never inside a probe (the round-2 design rebuilt the lake on every
    * probe call). */
  def buildLshIndex(embeddings: DataFrame, planes: Seq[Seq[Double]],
                    lakePath: String): Unit =
    withLshBucket(embeddings, planes)
      .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(lakePath)

  /** Pure ANN probe against a built LSH index: the query vector is
    * looked up from `embeddings` (pushed-down point filter), its bucket
    * computed, and the lake scan filtered on that literal bucket — a
    * PartitionFilter, so ONE directory is read, not the corpus
    * (asserted in PlanAuditSpec). The only driver-side action is the
    * one-scalar bucket lookup (a parameter fetch, not a data loop); the
    * query embedding itself stays a broadcast 1-row frame. */
  def lshProbe(spark: SparkSession, lakePath: String, embeddings: DataFrame,
               queryId: Long, k: Int, planes: Seq[Seq[Double]]): DataFrame = {
    val q = withLshBucket(embeddings.filter(col("vec_id") === queryId), planes)
      .select(col("embedding").as("q_embedding"), col("bucket"))
    // missing query id → empty result (same contract as lshTopK), not a
    // head()-on-empty crash
    val qBucketRow = q.select("bucket").head(1)
    if (qBucketRow.isEmpty)
      return spark.read.parquet(lakePath).filter(lit(false))
        .select(col("vec_id"), lit(0.0).as("cos"),
          col("bucket").cast("long").as("bucket"))
    val qBucket = qBucketRow.head.getLong(0)
    spark.read.parquet(lakePath)
      .filter(col("bucket") === qBucket && col("vec_id") =!= queryId)
      .crossJoin(broadcast(q.select(col("q_embedding"))))
      .withColumn("cos", round(cosine(col("embedding"), col("q_embedding")), 4))
      .orderBy(desc("cos"), asc("vec_id"))
      // partition-column inference narrows bucket to INT on read-back;
      // restore the builder's LongType (oracle type parity)
      .select(col("vec_id"), col("cos"), col("bucket").cast("long").as("bucket"))
      .limit(k)
  }

  /** Build-then-probe composition kept for API compatibility; real
    * sessions call buildLshIndex once and lshProbe per query. */
  def lshTopKPruned(spark: SparkSession, embeddings: DataFrame, queryId: Long,
                    k: Int, planes: Seq[Seq[Double]], lakePath: String): DataFrame = {
    buildLshIndex(embeddings, planes, lakePath)
    lshProbe(spark, lakePath, embeddings, queryId, k, planes)
  }

  /** MULTIPROBE LSH — the standard recall knob on a hyperplane index
    * (Lv et al.): besides the query's own bucket, probe the buckets at
    * Hamming distance 1 (one sign bit flipped — the buckets a near
    * neighbor most likely fell into when it straddled one plane). Recall
    * is monotone in probes and converges to exact as probes → 2^planes,
    * while the scan stays PartitionFilter-pruned to `1 + nFlips`
    * directories of the lake — the cost dial is directories read, never
    * a corpus scan. The probe-bucket list is planes+1 literals (driver
    * arithmetic on one scalar — parameter class, like the codebook). */
  def lshProbeMulti(spark: SparkSession, lakePath: String,
                    embeddings: DataFrame, queryId: Long, k: Int,
                    planes: Seq[Seq[Double]],
                    nFlips: Int = Int.MaxValue): DataFrame = {
    val q = withLshBucket(embeddings.filter(col("vec_id") === queryId), planes)
      .select(col("embedding").as("q_embedding"), col("bucket"))
    val qBucketRow = q.select("bucket").head(1)
    if (qBucketRow.isEmpty)
      return spark.read.parquet(lakePath).filter(lit(false))
        .select(col("vec_id"), lit(0.0).as("cos"),
          col("bucket").cast("long").as("bucket"))
    val qBucket = qBucketRow.head.getLong(0)
    val flips = math.min(nFlips, planes.size)
    val probeBuckets = qBucket +:
      (0 until flips).map(b => qBucket ^ (1L << b))
    spark.read.parquet(lakePath)
      .filter(col("bucket").isin(probeBuckets: _*) &&
        col("vec_id") =!= queryId)
      .crossJoin(broadcast(q.select(col("q_embedding"))))
      .withColumn("cos",
        round(cosine(col("embedding"), col("q_embedding")), 4))
      .orderBy(desc("cos"), asc("vec_id"))
      .select(col("vec_id"), col("cos"), col("bucket").cast("long").as("bucket"))
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

  /** One-off IVF index build: train the codebook (two corpus passes) and
    * lay the corpus out hive-partitioned by cell. Returns the codebook —
    * the probe needs it to rank cells. Build cost is paid ONCE per
    * corpus version, never inside a probe. */
  def buildIvfIndex(embeddings: DataFrame, k: Int, lakePath: String,
                    seed: Long = 42L): Seq[Seq[Double]] = {
    val codebook = ivfCodebook(embeddings, k, seed)
    embeddings
      .withColumn("cell",
        coalesce(nearestCentroidId(col("embedding"), codebook), lit(-1)))
      .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(lakePath)
    codebook
  }

  /** Pure IVF probe against a built index: rank cells for the query
    * vector (one driver-side nProbe-int fetch — a parameter lookup, not
    * a data loop), then scan ONLY those cell directories — the literal
    * isin predicate is a PartitionFilter, so the scan reads nProbe of k
    * directories (asserted in PlanAuditSpec). Same output as ivfTopK.
    *
    * `pred` turns this into FILTERED ANN (e.g. label = 3): the metadata
    * predicate lands on the pruned cell scan as a pushed parquet filter
    * — cells narrow the search, the filter narrows the cells, and no
    * excluded row ever reaches a cosine. Filtered probes should raise
    * `nProbe` (selective slices thin each cell's candidate pool — the
    * standard filtered-ANN recall trade, recall property-specced). */
  def ivfProbe(spark: SparkSession, lakePath: String, embeddings: DataFrame,
               codebook: Seq[Seq[Double]], queryId: Long, k: Int,
               nProbe: Int = 4, pred: Column = lit(true)): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"),
        topCentroidIds(col("embedding"), codebook, nProbe).as("q_cells"))
    val qRow = q.head(1)
    if (qRow.isEmpty)
      return spark.read.parquet(lakePath).filter(lit(false))
        .select(col("vec_id"), lit(0.0).as("cos"), col("cell"))
    val cells = qRow.head.getSeq[Int](1)
    spark.read.parquet(lakePath)
      .filter(col("cell").isin(cells: _*) && col("vec_id") =!= queryId)
      .filter(pred)
      .crossJoin(broadcast(q.select(col("q_embedding"))))
      .withColumn("cos", round(cosine(col("embedding"), col("q_embedding")), 4))
      .orderBy(desc("cos"), asc("vec_id"))
      .select(col("vec_id"), col("cos"), col("cell"))
      .limit(k)
  }

  /** Incremental index maintenance — the ANN analog of IncrementalDedup:
    * a NEW batch of vectors is assigned with the EXISTING codebook and
    * appended to the cell-partitioned lake. Only the touched cell
    * directories gain files; the corpus is never rewritten and probes
    * see the new vectors immediately (the isin PartitionFilter matches
    * old and new files alike). Re-train the codebook only on corpus
    * versioning — drift degrades recall gracefully, never correctness
    * (every vector still lands in exactly one cell). */
  def appendToIvfIndex(newVectors: DataFrame, codebook: Seq[Seq[Double]],
                       lakePath: String): Unit =
    newVectors
      .withColumn("cell",
        coalesce(nearestCentroidId(col("embedding"), codebook), lit(-1)))
      .write.mode(SaveMode.Append).partitionBy("cell").parquet(lakePath)

  /** Same for the hyperplane-LSH layout: new vectors bucket with the
    * frozen planes and append into their bucket directories. */
  def appendToLshIndex(newVectors: DataFrame, planes: Seq[Seq[Double]],
                       lakePath: String): Unit =
    withLshBucket(newVectors, planes)
      .write.mode(SaveMode.Append).partitionBy("bucket").parquet(lakePath)

  /** Batch kNN JOIN — every probe row finds its top-k corpus neighbors,
    * the form an embedding pipeline actually runs (the single-query
    * probes above are its point lookups). IVF-cell equi-join: the corpus
    * is assigned one cell per vector, probes explode their nProbe
    * nearest cells, and candidates meet on the cell key — no cross join
    * anywhere in the plan. Per-probe top-k is the typed TopKAggregator
    * (map-side partial heaps), so the only wide exchanges are the cell
    * equi-join and a k-row-per-probe aggregation.
    *
    * Scale note: parallelism of the cell join is bounded by the codebook
    * size — size k ~ O(√corpus) in production (16k cells at 1B vectors)
    * so cells spread across every executor; AQE's skew split handles hot
    * cells. Recall is the IVF nProbe/k trade, property-tested against
    * bruteForceTopK. Self-matches (probe id == corpus id) are excluded
    * so self-kNN over one table matches bruteForceTopK's contract. */
  def knnJoin(probes: DataFrame, corpus: DataFrame, k: Int,
              codebook: Seq[Seq[Double]], nProbe: Int = 4): DataFrame = {
    import graft.functions.TopKAggregator
    val assigned = Scale.fanOut(corpus, Seq("vec_id"))
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        l2Norm(col("embedding")).as("c_nrm"),
        coalesce(nearestCentroidId(col("embedding"), codebook), lit(-1)).as("cell"))
    val probed = Scale.fanOut(probes, Seq("vec_id"))
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"),
        l2Norm(col("embedding")).as("p_nrm"),
        explode(topCentroidIds(col("embedding"), codebook, nProbe)).as("cell"))
    // each corpus vector lives in exactly ONE cell and probe cells are
    // distinct, so a (probe, corpus) pair meets at most once — no
    // distinct() needed before the top-k
    probed.join(assigned, "cell")
      .filter(col("p_id") =!= col("c_id"))
      .select(col("p_id"),
        round(dot(col("p_emb"), col("c_emb")) /
          (col("p_nrm") * col("c_nrm")), 4).as("cos"),
        col("c_id"))
      .groupBy("p_id")
      .agg(TopKAggregator.topK(k)(col("cos"), col("c_id")).as("top"))
      .select(col("p_id"), explode(col("top")).as("t"))
      .select(col("p_id"), col("t.id").as("c_id"), col("t.score").as("cos"))
  }

  /** Batch kNN join against a BUILT IVF index: the corpus side reads
    * the cell-partitioned lake as-is (assignments already materialized
    * at build/append time — zero per-query assignment evals on the
    * corpus), probes explode their nProbe cells, candidates meet on the
    * cell equi-join. The per-query work is proportional to the probe
    * batch, exactly like the single-query ivfProbe. */
  def knnJoinIndexed(spark: SparkSession, lakePath: String, probes: DataFrame,
                     k: Int, codebook: Seq[Seq[Double]],
                     nProbe: Int = 4): DataFrame = {
    import graft.functions.TopKAggregator
    val assigned = spark.read.parquet(lakePath)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        l2Norm(col("embedding")).as("c_nrm"), col("cell"))
    val probed = Scale.fanOut(probes, Seq("vec_id"))
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"),
        l2Norm(col("embedding")).as("p_nrm"),
        explode(topCentroidIds(col("embedding"), codebook, nProbe)).as("cell"))
    probed.join(assigned, "cell")
      .filter(col("p_id") =!= col("c_id"))
      .select(col("p_id"),
        round(dot(col("p_emb"), col("c_emb")) /
          (col("p_nrm") * col("c_nrm")), 4).as("cos"),
        col("c_id"))
      .groupBy("p_id")
      .agg(TopKAggregator.topK(k)(col("cos"), col("c_id")).as("top"))
      .select(col("p_id"), explode(col("top")).as("t"))
      .select(col("p_id"), col("t.id").as("c_id"), col("t.score").as("cos"))
  }

  /** Recall@k evaluation of the IVF approximate kNN join against the
    * exact answer — the self-measurement a vector pipeline publishes
    * next to its index parameters (recall is the product being sold;
    * it should be MEASURED, not inferred from the nProbe/k folklore).
    *
    * Exact baseline: the probe batch broadcasts against one full corpus
    * scan (probe batches are small by contract — this is an evaluation
    * harness, not the serving path), with the SAME TopKAggregator and
    * (score, id) tie order as the approximate side, so recall 1.0 is
    * exactly reachable and the compare is deterministic under ties.
    * Output: one row (n_probes, k, n_probe_cells, recall). The
    * semi-join hit count is per (probe, neighbor) — order-insensitive
    * set intersection. */
  def recallReport(probes: DataFrame, corpus: DataFrame, k: Int,
                   codebook: Seq[Seq[Double]], nProbe: Int): DataFrame = {
    import graft.functions.TopKAggregator
    val p = probes.select(col("vec_id").as("p_id"),
      col("embedding").as("p_emb"), l2Norm(col("embedding")).as("p_nrm"))
    val c = corpus.select(col("vec_id").as("c_id"),
      col("embedding").as("c_emb"), l2Norm(col("embedding")).as("c_nrm"))
    val exact = c.crossJoin(broadcast(p))
      .filter(col("p_id") =!= col("c_id"))
      .select(col("p_id"),
        round(dot(col("p_emb"), col("c_emb")) /
          (col("p_nrm") * col("c_nrm")), 4).as("cos"),
        col("c_id"))
      .groupBy("p_id")
      .agg(TopKAggregator.topK(k)(col("cos"), col("c_id")).as("top"))
      .select(col("p_id"), explode(col("top")).as("t"))
      .select(col("p_id"), col("t.id").as("c_id"))
    val approx = knnJoin(probes, corpus, k, codebook, nProbe)
      .select("p_id", "c_id")
    val nProbes = exact.select("p_id").distinct().count()
    val hits = approx.join(exact, Seq("p_id", "c_id"), "left_semi").count()
    val spark = probes.sparkSession
    import spark.implicits._
    Seq((nProbes, k, nProbe,
      BigDecimal(hits.toDouble / (nProbes.toDouble * k))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_probes", "k", "n_probe_cells", "recall")
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
    * the candidate set — tune per threshold.
    *
    * PAYLOAD-LIGHT banding: only (vec_id, bks, table, bucket) rides the
    * nTables-wide band shuffle — the bks arrays needed for the row-local
    * first-agree dedup, never the embeddings. The vectors and their
    * hoisted norms join back onto the deduped candidate PAIR set for the
    * cosine verify. At production dims the ride-along variant shuffles
    * nTables× the corpus' largest column (dim≥768 ⇒ ≥3 KB/vector/table);
    * here the banded payload is 8·nTables bytes per row regardless of
    * dim, and the verify joins touch each embedding once per candidate —
    * candidates ≪ banded rows after first-agree dedup. (At the test's
    * dim=64/sf0.1 both variants measure within noise; the light variant
    * is the default because its shuffle width is dim-independent.) */
  def neardupPairsLsh(embeddings: DataFrame, threshold: Double,
                      nTables: Int = 16, nPlanes: Int = 4, dim: Int = 64,
                      seed: Long = 42L): DataFrame = {
    val allPlanes = seededPlanes(nTables * nPlanes, dim, seed)
    val fanned = Scale.fanOut(embeddings, Seq("vec_id"))
    val banded = fanned
      .select(col("vec_id"),
        hyperplaneBucketsNative(col("embedding"), allPlanes, nPlanes).as("bks"))
      .select(col("vec_id"), col("bks"),
        posexplode(col("bks")).as(Seq("tbl", "bucket")))
      // no bucket cap on this path: the empty `over_bands` list exists
      // only to feed the shared first-under-cap-agreeing-band predicate
      .withColumn("over_bands", array().cast("array<int>"))
    val candidates =
      Scale.bandJoinFirstAgree(banded, "vec_id", band = "tbl", key = "bucket")
        .select(col("x.vec_id").as("v1"), col("y.vec_id").as("v2"))
    val withNorm = fanned.select(col("vec_id"), col("embedding"),
      l2Norm(col("embedding")).as("nrm"))
    candidates
      .join(withNorm.select(col("vec_id").as("v1"), col("embedding").as("e1"),
        col("nrm").as("n1")), "v1")
      .join(withNorm.select(col("vec_id").as("v2"), col("embedding").as("e2"),
        col("nrm").as("n2")), "v2")
      .select(col("v1"), col("v2"),
        round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** PCA basis of the embedding corpus: mean vector, top-`nc` principal
    * directions, and their eigenvalues (variances along each).
    *
    * The corpus-side work is ONE pass: the MomentsAggregator
    * partial-aggregates (n, Σx, Σxxᵀ-upper-tri) map-side, so the
    * shuffle carries a single ~17 KB buffer per map task. The d×d
    * covariance then lives on the DRIVER (justified scalar — d² doubles
    * regardless of corpus size, the codebook-training class) where
    * deterministic seeded power iteration with deflation extracts the
    * top components. Eigen-residual ‖Cv − λv‖ is spec-asserted. */
  def pcaBasis(embeddings: DataFrame, nc: Int = 2, iters: Int = 100)
      : (Array[Double], Array[Array[Double]], Array[Double]) = {
    import graft.functions.MomentsAggregator
    val dim = embeddings.select(size(col("embedding"))).head.getInt(0)
    require(nc >= 1 && nc <= dim, s"need 1 <= nc <= $dim")
    val m = embeddings
      .agg(MomentsAggregator.vectorMoments(dim)(
        col("embedding").cast("array<double>")).as("m"))
      .select(col("m.n"), col("m.s"), col("m.ss")).head()
    val n = m.getLong(0)
    require(n > 1, "PCA needs at least 2 vectors")
    val s = m.getSeq[Double](1).toArray
    val ss = m.getSeq[Double](2).toArray
    val mu = s.map(_ / n)
    val work = Array.ofDim[Double](dim, dim)
    var t = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = ss(t) / n - mu(i) * mu(j)
        work(i)(j) = c; work(j)(i) = c; t += 1; j += 1
      }
      i += 1
    }
    def matVec(a: Array[Array[Double]], v: Array[Double]): Array[Double] =
      a.map { row =>
        var acc = 0.0; var k = 0
        while (k < dim) { acc += row(k) * v(k); k += 1 }
        acc
      }
    def normalized(v: Array[Double]): Array[Double] = {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      if (nrm == 0.0) v else v.map(_ / nrm)
    }
    val rng = new java.util.Random(42L) // fixed seed: deterministic basis
    val comps = Array.ofDim[Double](nc, dim)
    val eig = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      // Gram-Schmidt against settled components every step: deflation
      // alone leaves O(convergence-gap) bleed-through when eigenvalues
      // are close, re-projection pins orthogonality to fp precision
      def orthogonalized(v: Array[Double]): Array[Double] = {
        var p = 0
        val out = v.clone()
        while (p < c) {
          val proj = comps(p).zip(out).map { case (a, b) => a * b }.sum
          var k = 0
          while (k < dim) { out(k) -= proj * comps(p)(k); k += 1 }
          p += 1
        }
        out
      }
      var v = normalized(orthogonalized(
        Array.fill(dim)(rng.nextDouble() - 0.5)))
      var it = 0
      while (it < iters) {
        v = normalized(orthogonalized(matVec(work, v)))
        it += 1
      }
      val av = matVec(work, v)
      val lambda = v.zip(av).map { case (a, b) => a * b }.sum
      comps(c) = v; eig(c) = lambda
      // deflate: work -= λ v vᵀ so the next iteration finds the next PC
      i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { work(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      c += 1
    }
    (mu, comps, eig)
  }

  /** Map-side PCA projection of every vector onto the top-`nc`
    * principal components — the standard dimensionality reduction
    * before distance work (64-d cosine → 2-8 doubles per row).
    * pc_c = x·v_c − μ·v_c: the centered projection WITHOUT materializing
    * x − μ per row — one codegen'd dot against a literal component plus
    * a scalar shift, no shuffle anywhere. */
  def pcaProject(embeddings: DataFrame, nc: Int = 2): DataFrame = {
    val (mu, comps, _) = pcaBasis(embeddings, nc)
    val pcs = comps.zipWithIndex.map { case (v, i) =>
      val shift = mu.zip(v).map { case (a, b) => a * b }.sum
      round(dot(col("embedding").cast("array<double>"),
        lit(v)) - shift, 6).as(s"pc${i + 1}")
    }
    embeddings.select(col("vec_id") +: col("label") +: pcs.toIndexedSeq: _*)
  }

  /** Exact MAX-INNER-PRODUCT top-k (MIPS — recommendation scoring,
    * where magnitude IS signal and cosine's normalization would erase
    * it: a popular item's long embedding should outrank an obscure
    * near-parallel one). Same plan shape as bruteForceTopK: 1-row query
    * broadcast, map-side native DotProduct, TakeOrdered — the corpus
    * never shuffles. At 100 TB the standard reduction applies: append
    * sqrt(M²−‖x‖²) as an extra dimension (M = max corpus norm) and MIPS
    * becomes cosine ANN, so every bucketed index here (LSH/IVF/PQ)
    * serves MIPS unchanged. */
  def mipsTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    embeddings.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("embedding"), col("q_embedding")), 4).as("ip"))
      .orderBy(desc("ip"), asc("vec_id"))
      .limit(k)
  }

  /** Rows unit-normalized ONCE for the k-means loop: with unit rows AND
    * unit centroids, argmax-dot is argmin angular distance, and the
    * spherical objective Σ(1 − v·c) is Lloyd-monotone in both steps. */
  private def unitRows(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("__n", l2Norm(col("e")))
      .select(col("vec_id"),
        when(col("__n") === 0.0, col("e"))
          .otherwise(transform(col("e"), x => x / col("__n"))).as("e"))

  /** Full SPHERICAL k-means (Lloyd's to convergence) — the clustering
    * pass LLM-data curation actually runs on embeddings (SemDeDup's
    * cluster-then-dedup, topic bucketing for mixture control; upgrades
    * [[ivfCodebook]]'s single refinement round to a converged fit).
    * Returns (unit codebook, per-iteration inertia trace).
    *
    * ONE aggregation per iteration: the (cell, pos) rollup of per-cell
    * vector SUMS — a k×dim-row shuffle of keyed scalars, map-side
    * combined — yields BOTH the new centroids (unit(S_cell)) and the
    * inertia under the centroids just used for assignment:
    * Σ(1 − v·c_old) = N − Σ_cell S_cell·c_old. No separate scoring
    * pass, no per-row state on the driver; the k×dim collect per round
    * is the codebook-training class of driver scalar (same as
    * ivfCodebook/pcaBasis). Assignment is the native NearestCentroid
    * expression, so each round's corpus cost is one codegen'd scan of
    * the ONCE-materialized unit rows (localCheckpoint — constant
    * lineage across rounds, the dd_cluster iteration pattern). Empty
    * cells keep their previous centroid. Stops when the max centroid
    * angular shift drops under `tol` or at `maxIters`. */
  def kmeansFit(embeddings: DataFrame, k: Int, maxIters: Int = 10,
                tol: Double = 1e-4, seed: Long = 42L)
      : (Seq[Seq[Double]], Seq[Double]) = {
    def unit(v: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    val u = unitRows(embeddings).localCheckpoint(true)
    var centroids: Seq[Seq[Double]] = u
      .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
      .limit(k).select("e")
      .collect().map(r => unit(r.getSeq[Double](0).toVector)).toVector
    val trace = scala.collection.mutable.ArrayBuffer[Double]()
    var it = 0
    var shift = Double.MaxValue
    while (it < maxIters && shift >= tol) {
      val rows = u
        .select(nearestCentroidId(col("e"), centroids).as("cell"),
          posexplode(col("e")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .collect()
      val byCell = rows.groupBy(_.getInt(0))
      var inertia = 0.0
      val next = centroids.zipWithIndex.map { case (old, c) =>
        byCell.get(c) match {
          case Some(cellRows) =>
            val sorted = cellRows.sortBy(_.getInt(1))
            val s = sorted.map(_.getDouble(2)).toVector
            inertia += sorted.head.getLong(3) -
              s.zip(old).map(p => p._1 * p._2).sum
            unit(s)
          case None => old
        }
      }
      trace += inertia
      shift = centroids.zip(next)
        .map { case (a, b) => 1.0 - a.zip(b).map(p => p._1 * p._2).sum }
        .max
      centroids = next
      it += 1
    }
    (centroids, trace.toSeq)
  }

  /** Contract surface over [[kmeansFit]]: the converged per-cluster
    * profile — size and mean cosine-to-centroid (cohesion), plus the
    * fit's iteration count and final inertia as constant audit columns.
    * The scoring pass reuses that each row's cosine to its ASSIGNED
    * centroid is simply its MAX dot over the unit codebook — no second
    * assignment join, one codegen'd scan. */
  def kmeansClusters(embeddings: DataFrame, k: Int, maxIters: Int = 10,
                     tol: Double = 1e-4, seed: Long = 42L): DataFrame = {
    val (codebook, trace) = kmeansFit(embeddings, k, maxIters, tol, seed)
    val bestDot = array_max(array(
      codebook.map(c => dot(col("e"), lit(c.toArray))): _*))
    unitRows(embeddings)
      .select(nearestCentroidId(col("e"), codebook).as("cell"),
        bestDot.as("cos"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), round(avg("cos"), 4).as("avg_cos"))
      .withColumn("n_iters", lit(trace.size))
      .withColumn("inertia", round(lit(trace.last), 4))
      .orderBy("cell")
  }

  /** ENGINE-EXACT deterministic spherical k-means — the DRIVER-CONTRACT
    * surface for ml_kmeans (the converged float fit stays [[kmeansFit]]/
    * [[kmeansClusters]], spec-verified). Everything that crosses rows is
    * INTEGER arithmetic, so any partitioning — and the DuckDB twin —
    * produces bit-identical results with zero float-summation-order risk:
    * vectors quantize to the 1e-3 lattice (q = round(1000·x) as longs),
    * seeds are the first k rows by portable md5(vec_id) order, centroids
    * are unit-scaled INTEGER vectors (round(1e6·S/‖S‖)), dot products and
    * sums of squares are exact longs, and the report's mean cosine sums
    * 6dp-quantized per-row cosines as longs before the one division.
    * Shape per round: one codegen'd scan for assignment (k literal
    * centroids — no join), one (cell, pos) rollup (k×dim keyed scalars,
    * map-side combined), one parameter-sized collect — the same scan
    * discipline as [[kmeansFit]], reproducible enough to hash-gate.
    * Fixed TWO assignment passes with one update between (deterministic
    * round count is part of the contract; convergence is kmeansFit's
    * job). Output: (cell, n, avg_cos). */
  def kmeansExactClusters(embeddings: DataFrame, k: Int = 8): DataFrame =
    kmeansExactAssign(embeddings, k)
      .select(col("cell"),
        floor(col("cos") * 1000000 + 0.5).cast("long").as("qc"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), sum("qc").as("sc"))
      .select(col("cell").cast("long").as("cell"), col("n"),
        round(col("sc").cast("double") / (col("n") * 1000000.0), 6)
          .as("avg_cos"))
      .orderBy("cell")

  /** CLUSTER PURITY of the engine-exact k-means against the embedding
    * labels — the external-validity check sp_silhouette (geometry) and
    * avg_cos (compactness) cannot give: does the UNSUPERVISED
    * partition recover the LABELED structure? Per cluster: majority
    * label and its share; a purity near 1/|labels| means the clusters
    * are geometric accidents, near 1.0 means the embedding space
    * separates the classes. Majority ties break to the larger label
    * (max-struct / ORDER BY c DESC, label DESC — identical on both
    * engines). One assignment pass + one label join; cluster-bounded
    * output. */
  def kmeansExactPurity(embeddings: DataFrame, k: Int = 8): DataFrame = {
    val a = kmeansExactAssign(embeddings, k).select("vec_id", "cell")
    a.join(embeddings.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy("cell", "label")
      .agg(count(lit(1)).as("c"))
      .groupBy("cell")
      .agg(sum("c").as("n"),
        max(struct(col("c"), col("label"))).as("top"))
      .select(col("cell").cast("long").as("cell"), col("n"),
        col("top.label").as("top_label"),
        round(col("top.c").cast("double") / col("n"), 6).as("purity"))
  }

  /** EMBEDDING-SPACE ISOTROPY audit — the space-quality gate in front
    * of every cosine-based surface here (anisotropic embeddings — a
    * dominant shared direction — inflate ALL pairwise cosines, so
    * ann_* similarity thresholds and dd_embed_neardup cutoffs
    * calibrated on one corpus silently break on the next; Ethayarajh
    * 2019 made this the standard embedding check): the mean pairwise
    * cosine over ALL n(n−1) pairs, computed WITHOUT the pair join via
    * the identity Σᵢ≠ⱼ uᵢ·uⱼ = ‖Σuᵢ‖² − Σ‖uᵢ‖², plus the largest
    * per-dimension |mean| (where the shared direction lives).
    * Near-0 mean cosine = isotropic; large = re-center before
    * trusting any cosine threshold.
    *
    * EXACT integer path: vectors quantize to the 1e-3 lattice and
    * unit-scale to the 1e6 integer sphere (the ml_kmeans codebook
    * convention — one quantization, every surface); per-dim sums and
    * square-sums accumulate in decimal(38,0), so the two norms are
    * exact integers on any partitioning and the mean cosine is ONE
    * double division in 1e12 units. One explode + dim-keyed rollup —
    * dim-bounded frames after the single corpus pass. */
  def isotropyAudit(embeddings: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = embeddings
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * 1000 + 0.5).cast("long")).as("q"))
      .withColumn("ssq", aggregate(col("q"), lit(0L), (a, y) => a + y * y))
    val u = v.select(posexplode(col("q")).as(Seq("pos", "x")),
        col("ssq"))
      .select(col("pos"),
        floor(col("x") * 1e6 / sqrt(col("ssq").cast("double")) + 0.5)
          .cast("long").as("uq"))
    val d = u.groupBy("pos")
      .agg(sum(col("uq").cast(dec)).as("s"),
        sum(col("uq").cast(dec) * col("uq").cast(dec)).as("sq"))
    val a = d.agg(count(lit(1)).as("dim"),
      sum(col("s") * col("s")).as("ss"), sum("sq").as("self"),
      max(abs(col("s"))).as("max_abs_s"))
    val nRow = embeddings.agg(count(lit(1)).as("n"))
    val n = col("n").cast("double")
    a.crossJoin(broadcast(nRow))
      .select(col("n"), col("dim"),
        round((col("ss") - col("self")).cast("double") /
          (n * (n - 1.0)) / 1e12, 6).as("avg_pair_cos"),
        round(col("max_abs_s").cast("double") / n / 1e6, 6)
          .as("max_dim_mean"))
  }

  /** The shared (vec_id → cell, cos) assignment of the ONE-REFINEMENT
    * engine-exact spherical k-means ([[kmeansExactClusters]] rolls it
    * up; [[kmeansExactPurity]] joins it against labels — one
    * definition, every surface). */
  private[operators] def kmeansExactAssign(embeddings: DataFrame,
                                           k: Int = 8): DataFrame = {
    import embeddings.sparkSession.implicits._
    // floor(v + 0.5): the oracle-identical half-up convention (the
    // engine-round half-case trap, SURVEY §8.6 / graft.operators.Exact)
    def scaleRound(v: Double): Long = math.floor(v + 0.5).toLong
    val v = embeddings
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * 1000 + 0.5).cast("long")).as("q"))
      .withColumn("ssq", aggregate(col("q"), lit(0L), (a, y) => a + y * y))
      .localCheckpoint(true)
    // seeds: first k rows in portable md5 order, unit-scaled to the 1e6
    // integer sphere (k×dim longs — the codebook class of driver scalar)
    val seeds: Seq[Seq[Long]] = v
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .select("q", "ssq")
      .collect()
      .map { r =>
        val q = r.getSeq[Long](0); val n = math.sqrt(r.getLong(1).toDouble)
        q.map(y => scaleRound(y * 1000000.0 / n))
      }.toSeq
    // one exploded (vec_id, ssq, pos, x) view serves every stage
    val exv = v.select(col("vec_id"), col("ssq"),
      posexplode(col("q")).as(Seq("pos", "x"))).localCheckpoint(true)
    // assignment as RELATIONAL ops (explode ⋈ broadcast codebook ⋈
    // partial-agg argmax) — the k HOF-dot-per-row expression tree this
    // replaces compiled to pathological whole-stage code (29 s at
    // sf0.1; this shape runs in under a second and is also the right
    // 100 TB plan: the codebook is a k×dim broadcast, dots partial-agg
    // map-side, nothing data-sized sits in one expression)
    def assignTo(cents: Seq[Seq[Long]]): DataFrame = {
      val cdf = broadcast(cents.zipWithIndex.flatMap { case (c, i) =>
        val cssq = c.map(y => y * y).sum
        c.zipWithIndex.map { case (cv, pos) => (i, pos, cv, cssq) }
      }.toDF("cell", "pos", "cv", "cssq"))
      exv.join(cdf, Seq("pos"))
        .groupBy(col("vec_id"), col("cell"))
        .agg(sum(col("x") * col("cv")).as("dot"),
          max("ssq").as("ssq"), max("cssq").as("cssq"))
        .select(col("vec_id"), struct(
          (col("dot").cast("double") /
            (sqrt(col("ssq").cast("double")) *
              sqrt(col("cssq").cast("double")))).as("cos"),
          (-col("cell")).as("negCell")).as("sc"))
        .groupBy("vec_id").agg(max("sc").as("best"))
        .select(col("vec_id"), (-col("best.negCell")).as("cell"),
          col("best.cos").as("cos"))
    }
    val sums = exv
      .join(assignTo(seeds).select("vec_id", "cell"), Seq("vec_id"))
      .groupBy("cell", "pos").agg(sum("x").as("sx"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }
    val cents1: Seq[Seq[Long]] = (0 until k).map { cell =>
      sums.get(cell) match {
        case Some(sl) =>
          val n = math.sqrt(sl.map(y => y * y).sum.toDouble)
          sl.map(y => scaleRound(y * 1000000.0 / n))
        case None => seeds(cell) // empty cell keeps its previous centroid
      }
    }
    assignTo(cents1)
  }

  /** LEAVE-ONE-OUT kNN-CLASSIFIER evaluation — "are the labels
    * actually clustered in embedding space": every probe vector is
    * classified by the majority label of its k nearest OTHER vectors
    * and scored against its own label, reported per class. The honest
    * embedding-quality gate for a labeled corpus (a high kNN accuracy
    * justifies [[knnJoin]]-based label propagation; a chance-level one
    * kills it before anyone ships it).
    *
    * EXACT by contract — the probe side is a sampled slice that rides
    * as a broadcast over one corpus scan (map-side cosine, no corpus
    * shuffle; the same exact-twin role dd_embed_neardup plays for the
    * LSH path). The 100 TB path swaps the broadcast-scan for
    * [[knnJoinIndexed]]'s cell equi-join and keeps the vote/rollup
    * identical. Vote and rank tie-breaks are fully ordered (cos 4dp
    * desc, then neighbor id; vote count desc, then label) so any
    * partitioning and the SQL twin agree exactly. */
  def knnClassifierEval(emb: DataFrame, k: Int = 5,
                        probeMod: Long = 10): DataFrame = {
    import graft.functions.VectorFunctions.{dot, l2Norm}
    val probes = broadcast(emb.filter(col("vec_id") % probeMod === 0)
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"),
        l2Norm(col("embedding")).as("p_nrm"),
        col("label").as("true_label")))
    val corpus = emb.select(col("vec_id").as("c_id"),
      col("embedding").as("c_emb"), l2Norm(col("embedding")).as("c_nrm"),
      col("label").as("c_label"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("p_id")
      .orderBy(col("cos").desc, col("c_id"))
    val neighbors = corpus.join(probes, col("p_id") =!= col("c_id"))
      .select(col("p_id"), col("true_label"), col("c_id"), col("c_label"),
        round(dot(col("p_emb"), col("c_emb")) /
          (col("p_nrm") * col("c_nrm")), 4).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
    val pred = neighbors
      .groupBy("p_id", "true_label", "c_label")
      .agg(count(lit(1)).as("votes"))
      .groupBy("p_id", "true_label")
      .agg(min(struct((-col("votes")).as("nv"), col("c_label").as("l")))
        .getField("l").as("pred_label"))
    pred.groupBy("true_label")
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("pred_label") === col("true_label"), 1L)
          .otherwise(0L)).as("n_correct"))
      .select(col("true_label"), col("n_eval"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n_eval"), 4)
          .as("accuracy"))
  }

  /** EMBEDDING-SPACE DECONTAMINATION audit — the semantic twin of the
    * n-gram contamination check (tx_contamination catches verbatim
    * eval leakage; paraphrased or re-formatted leakage only the
    * embedding sees): every held-out probe vector (vec_id ≡ 0 mod
    * `probeMod` — the "eval set") is scored against the REST of the
    * corpus by exact lattice cosine, reporting its maximum corpus
    * similarity, the nearest corpus id (ties to the smaller id), and
    * how many corpus vectors clear the contamination threshold τ.
    * A max_cos near 1 is a leaked (or near-duplicate) eval item; the
    * n_flagged column sizes the cleanup.
    *
    * Shape: the probe slice rides as a broadcast over ONE corpus scan
    * (map-side integer dot on the 1e-3 lattice — floor convention,
    * bit-identical to the SQL twin), per-probe rollup; the 100 TB
    * path swaps the broadcast-scan for the LSH/IVF bucket join and
    * keeps the rollup identical (the knnClassifierEval contract). */
  def embedContamination(embeddings: DataFrame, probeMod: Long = 50,
                         tau: Double = 0.9): DataFrame = {
    def lat(c: Column) = transform(c.cast("array<double>"),
      x => floor(x * 1000 + 0.5).cast("long"))
    val v = embeddings.select(col("vec_id"), lat(col("embedding")).as("q"))
      .withColumn("ssq", aggregate(col("q"), lit(0L), (a, y) => a + y * y))
    val probes = broadcast(v.filter(col("vec_id") % probeMod === 0)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"),
        col("ssq").as("pssq")))
    Scale.fanOut(v.filter(col("vec_id") % probeMod =!= 0))
      .crossJoin(probes)
      .withColumn("cos", round(
        aggregate(zip_with(col("pq"), col("q"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).cast("double") /
          (sqrt(col("pssq").cast("double")) *
            sqrt(col("ssq").cast("double"))), 4))
      .groupBy("probe_id")
      .agg(max(struct(col("cos"), (-col("vec_id")).as("ni"))).as("best"),
        sum(when(col("cos") >= tau, 1L).otherwise(0L)).as("n_flagged"))
      .select(col("probe_id"), col("best.cos").as("max_cos"),
        (-col("best.ni")).as("nearest_id"), col("n_flagged"))
  }

  /** The 100 TB path of [[embedContamination]]: identical per-probe
    * rollup (max corpus cosine, nearest id, flagged count on the same
    * exact 1e-3 lattice), but candidates come from a multi-table
    * hyperplane-LSH (table, bucket) EQUI-JOIN instead of broadcasting
    * the probe slice over a corpus scan. The exact surface broadcasts
    * corpus/probeMod vectors — at 100 TB of embeddings that broadcast
    * is terabytes; here BOTH sides shuffle only compact band keys
    * ((vec_id, bks, tbl, bucket) — 8·nTables bytes/row, dim-free) and
    * candidates meet bucket-locally, deduped row-locally by the
    * first-agreeing-table predicate (the neardupPairsLsh shape — no
    * candidate-wide distinct()).
    *
    * Approximate by construction: a probe's true nearest neighbor is a
    * candidate only if they co-bucket in ≥1 table (recall
    * 1-(1-(1-θ/π)^nPlanes)^nTables — spec-measured against the exact
    * surface, which stays the audit baseline). Probes with NO candidate
    * survive with null max_cos/nearest_id and n_flagged 0 (a probe that
    * collides with nothing is evidence of cleanliness, not a row to
    * drop silently). Rows-only surface: the candidate set is
    * plane-seed-private. */
  def embedContaminationLsh(embeddings: DataFrame, probeMod: Long = 50,
                            tau: Double = 0.9, nTables: Int = 16,
                            nPlanes: Int = 4, dim: Int = 64,
                            seed: Long = 42L): DataFrame = {
    val allPlanes = seededPlanes(nTables * nPlanes, dim, seed)
    def lat(c: Column) = transform(c.cast("array<double>"),
      x => floor(x * 1000 + 0.5).cast("long"))
    val v = Scale.fanOut(embeddings, Seq("vec_id"))
      .select(col("vec_id"), col("embedding"),
        hyperplaneBucketsNative(col("embedding"), allPlanes, nPlanes)
          .as("bks"))
      .localCheckpoint(true) // 3 consumers below; don't re-scan + re-sketch
    val banded = v.select(col("vec_id"), col("bks"),
      posexplode(col("bks")).as(Seq("tbl", "bucket")))
    val pb = banded.filter(col("vec_id") % probeMod === 0)
      .select(col("vec_id").as("probe_id"), col("bks").as("p_bks"),
        col("tbl"), col("bucket"))
    val cb = banded.filter(col("vec_id") % probeMod =!= 0)
    // candidate pairs meet on the (table, bucket) equi-join; keep each
    // (probe, corpus) pair once — only in its first agreeing table
    // (sides are disjoint id sets, so no x<y ordering is involved)
    val cand = pb.join(cb, Seq("tbl", "bucket"))
      .filter(col("tbl") === array_position(
        zip_with(col("p_bks"), col("bks"), (p, q) => p === q), true) - 1)
      .select(col("probe_id"), col("vec_id"))
    // exact-lattice cosine verify on candidates only — same quantization
    // as the exact surface so scores are comparable one-for-one
    val q = v.select(col("vec_id"), lat(col("embedding")).as("q"))
      .withColumn("ssq", aggregate(col("q"), lit(0L), (a, y) => a + y * y))
    val scored = cand
      .join(q.select(col("vec_id").as("probe_id"), col("q").as("pq"),
        col("ssq").as("pssq")), "probe_id")
      .join(q, "vec_id")
      .withColumn("cos", round(
        aggregate(zip_with(col("pq"), col("q"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).cast("double") /
          (sqrt(col("pssq").cast("double")) *
            sqrt(col("ssq").cast("double"))), 4))
      .groupBy("probe_id")
      .agg(max(struct(col("cos"), (-col("vec_id")).as("ni"))).as("best"),
        sum(when(col("cos") >= tau, 1L).otherwise(0L)).as("n_flagged"))
    v.filter(col("vec_id") % probeMod === 0)
      .select(col("vec_id").as("probe_id"))
      .join(scored, Seq("probe_id"), "left")
      .select(col("probe_id"), col("best.cos").as("max_cos"),
        (-col("best.ni")).as("nearest_id"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"))
  }
}
