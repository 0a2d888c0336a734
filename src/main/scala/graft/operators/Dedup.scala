package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY §2.G).
  *
  * Exact dedup groups on a content fingerprint (one shuffle of 16-byte
  * keys, never of document bodies). N-gram Jaccard is the exact
  * pairwise baseline: shingle-explode → shingle-join → per-pair overlap
  * count. It is quadratic in the worst case — MinHash-LSH (see
  * MinHashLSH) is the scale path; this operator is the ground truth the
  * sketch variants are validated against.
  */
object Dedup {

  /** Corpus-level exact-duplicate stats on the normalized-text md5. */
  def exactStats(documents: DataFrame): DataFrame =
    documents
      .select(contentFingerprint(col("text")).as("fp"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_distinct"))
      .withColumn("n_dup_docs", col("n_docs") - col("n_distinct"))

  /** Representative picking: smallest doc_id kept per fingerprint group;
    * returns the deduplicated corpus. One shuffle on the 16-byte
    * fingerprint (row_number window) — the groupBy-then-join-back
    * formulation shuffles the corpus twice and re-scans it. */
  def dropExactDuplicates(documents: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy("doc_id")
    documents
      .withColumn("fp", contentFingerprint(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("fp", "__rn")
      .withColumnRenamed("doc_id", "keep_id")
  }

  /** Distinct word n-gram shingles per document. */
  def docShingles(documents: DataFrame, n: Int): DataFrame =
    documents.select(col("doc_id"),
      explode(shingles(col("text"), n)).as("shingle"))

  /** Exact n-gram Jaccard over candidate pairs (docs sharing ≥1 shingle).
    * |A∩B| from the shingle join, |A|,|B| precomputed, J = ∩/(|A|+|B|-∩).
    * Pairs below `threshold` are dropped. */
  def ngramJaccardPairs(documents: DataFrame, n: Int, threshold: Double): DataFrame = {
    // note: joining on xxhash64(shingle) instead of the string was
    // measured SLOWER at sf0.1 (short strings join fine; hashing both
    // sides just adds compute) — keep the direct string join
    val sh = docShingles(documents, n)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.select(col("doc_id").as("d1"), col("n_sh").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n_sh").as("n2")), "d2")
      .withColumn("jaccard",
        round(col("shared") / (col("n1") + col("n2") - col("shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("shared"), col("jaccard"))
  }

  /** Connected components over a near-dup pair list (d1 < d2): cluster
    * id = smallest doc_id reachable. Iterative min-label propagation —
    * the Spark-native CC (each round: join labels to edges, take the
    * neighborhood min; converges in O(diameter) rounds, O(log n) with
    * both edge directions). The loop is driver-side but each round is a
    * distributed join; dup clusters are tiny diameter in practice, and
    * `maxIter` bounds pathological chains. */
  def dupClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // near-dup edge lists are tiny relative to the corpus: collapse to a
    // few partitions before caching so each fixpoint round doesn't pay
    // 32 near-empty task launches per job
    val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .unionByName(pairs.select(col("d2").as("a"), col("d1").as("b")))
      .coalesce(4)
      .cache()
    // localCheckpoint each round: without it the logical plan nests per
    // iteration and the driver OOMs compiling it (the classic iterative-
    // Spark trap). Pointer doubling (label := label(label)) makes
    // convergence O(log n) rounds instead of O(diameter).
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint(true)
    // dup-cluster label frames are tiny relative to the corpus (only docs
    // appearing in pairs) — broadcast them into the per-round joins so an
    // iteration is shuffle-free. For genuinely huge components fall back
    // by passing broadcastLabels = false.
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaNeighbors = edges
        .join(broadcast(labels.select(col("id").as("b"), col("cluster_id").as("nb_label"))), "b")
        .groupBy(col("a").as("id"))
        .agg(min("nb_label").as("nb_min"))
      val afterNb = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("nb_min"), col("cluster_id")))
            .as("cluster_id"))
      val doubled = afterNb
        .join(broadcast(
          afterNb.select(col("id").as("cluster_id"), col("cluster_id").as("ll"))),
          Seq("cluster_id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("ll"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint(true)
      val changed = doubled
        .join(labels.select(col("id"), col("cluster_id").as("old")), "id")
        .filter(col("cluster_id") < col("old")).count()
      labels = doubled
      converged = changed == 0
      i += 1
    }
    labels.withColumnRenamed("id", "doc_id")
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`. Exact
    * all-pairs baseline (the LSH-bucketed variant in SimilaritySearch is
    * the 100 TB path). */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.{dot, l2Norm}
    // Norms are computed ONCE per vector before the pair join (carried as
    // a scalar through the join) — recomputing them per pair tripled the
    // flops and dominated the profile.
    val withNorm = embeddings.select(col("vec_id"), col("embedding"),
      l2Norm(col("embedding")).as("nrm"))
    val a = withNorm.select(col("vec_id").as("v1"), col("embedding").as("e1"),
      col("nrm").as("n1"))
    val b = withNorm.select(col("vec_id").as("v2"), col("embedding").as("e2"),
      col("nrm").as("n2"))
    a.join(b, col("v1") < col("v2"))
      .withColumn("cos", round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 4))
      .filter(col("cos") >= threshold)
      .select(col("v1"), col("v2"), col("cos"))
  }
}
