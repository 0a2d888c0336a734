package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus dedup — the most-hit operator of a production
  * training-data pipeline: a NEW batch of documents arrives and must be
  * deduped against the EXISTING 100 TB corpus without rescanning it
  * (reference anchor: work/spark_processor.py's append pipeline, which
  * has no dedup — this is its production form, SURVEY §2.G).
  *
  * Two layers, mirroring the batch dedup family:
  *  - exact: the new batch's content fingerprints anti-join the stored
  *    fingerprint set (16-byte keys — the corpus text is never read);
  *  - near-dup: survivors are matched against the stored MinHash sketch
  *    index (SketchDedup.minhashIndex) by banded equi-join — again no
  *    corpus text, only (doc_id, sig, bks) rows.
  *
  * `incrementalDedup` is the exact-Jaccard twin (DuckDB-oracle-checked:
  * fingerprint anti-join + threshold join); `incrementalDedupLsh` is the
  * scale path against a stored index, property-tested against it.
  */
object IncrementalDedup {

  /** Exact n-gram Jaccard pairs ACROSS two frames (new docs × corpus) —
    * the cross-frame form of Dedup.ngramJaccardPairs, same shingle-hash
    * join shape (8-byte shuffle keys, sizes ride the shingle rows). */
  def ngramJaccardAgainst(newDocs: DataFrame, corpus: DataFrame,
                          n: Int, threshold: Double): DataFrame = {
    import graft.plans.ShingleHashes
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def sh(df: DataFrame): DataFrame = {
      val hashes = ColumnBridge.column(
        ShingleHashes(ColumnBridge.expression(col("text")), n))
      Scale.fanOut(df.select("doc_id", "text"), Seq("doc_id"))
        .select(col("doc_id"), hashes.as("hs"))
        .select(col("doc_id"), size(col("hs")).as("n_sh"), explode(col("hs")).as("sk"))
    }
    sh(newDocs).as("a")
      .join(sh(corpus).as("b"), col("a.sk") === col("b.sk"))
      .groupBy(col("a.doc_id").as("new_id"), col("b.doc_id").as("old_id"),
        col("a.n_sh").as("n1"), col("b.n_sh").as("n2"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard",
        round(col("shared") / (col("n1") + col("n2") - col("shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("old_id"), col("shared"), col("jaccard"))
  }

  /** Admit the new docs that survive incremental dedup against the
    * corpus: (1) intra-batch exact dups collapse to the smallest doc_id,
    * (2) fingerprints already in the corpus anti-join away, (3) docs
    * with an exact n-gram Jaccard >= `threshold` against ANY corpus doc
    * drop. Exact twin — the oracle for the LSH variant below; the
    * corpus text IS read here (the sketch-index path avoids that). */
  def incrementalDedup(newDocs: DataFrame, corpus: DataFrame,
                       n: Int = 3, threshold: Double = 0.2): DataFrame = {
    val w = Window.partitionBy("fp").orderBy("doc_id")
    val batchKeep = Scale.fanOut(newDocs, Seq("doc_id"))
      .withColumn("fp", contentFingerprint(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val oldFps = corpus.select(contentFingerprint(col("text")).as("fp")).distinct()
    val cand = batchKeep.join(oldFps, Seq("fp"), "left_anti").drop("fp")
    val matched = ngramJaccardAgainst(cand, corpus, n, threshold)
      .select(col("new_id").as("doc_id")).distinct()
    cand.join(matched, Seq("doc_id"), "left_anti")
      .select("doc_id", "n_chars")
  }

  /** One-off dedup-index build for a corpus version: the fingerprint
    * store (16 bytes/doc) and the MinHash sketch index (doc_id, sig,
    * bks) written side by side. Incremental batches dedup against THESE
    * — the corpus text is never rescanned. */
  /** Sketch-store format tag: bumped whenever the sketch family
    * changes (r13: xxhash64+affine → two-poly fingerprints + CW
    * permutations + poly band folds). A store written by an older
    * build lacks the column entirely, so [[incrementalDedupLsh]]'s
    * plan-time check fails LOUDLY instead of probing a stale index
    * whose band keys can never match (which would silently admit
    * every near-dup). */
  val SketchFamily = "poly60-cw-v2"

  def buildDedupIndex(corpus: DataFrame, path: String,
                      n: Int = 3, k: Int = 32, bands: Int = 8): Unit = {
    Scale.fanOut(corpus.select("doc_id", "text"), Seq("doc_id"))
      .select(contentFingerprint(col("text")).as("fp")).distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$path/fps")
    SketchDedup.minhashIndex(corpus, n, k, bands)
      .withColumn("sketch_family", lit(SketchFamily))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/sketches")
  }

  /** Bloom-filter pre-pruned corpus fingerprints: only corpus fps that
    * MIGHT be in the new batch (by a bloom built over the batch's fps)
    * survive the scan — scan-local, before any exchange. The batch is
    * the small side by construction, so its bloom is a few MB riding a
    * scalar subquery; the 100 TB fp store then ships ~(true dups +
    * fpp·|corpus|) rows into the anti-join instead of every fingerprint.
    * Blooms have NO false negatives, so downstream equality joins stay
    * EXACT — this is the explicit form of Spark's own runtime-filter
    * injection, pushed below a join AQE can't see through. */
  def bloomPrunedFps(spark: SparkSession, corpusFps: DataFrame,
                     batchFps: DataFrame, expectedItems: Long = 1L << 20,
                     numBits: Long = 1L << 23): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    batchFps.select("fp").createOrReplaceTempView("graft_bloom_batch_fps")
    corpusFps.select("fp").createOrReplaceTempView("graft_bloom_corpus_fps")
    // empty batch → bloom_filter_agg yields NULL → might_contain NULL →
    // zero corpus fps survive, which is exactly right (nothing to match)
    spark.sql(
      s"""SELECT fp FROM graft_bloom_corpus_fps
          WHERE graft_might_contain(
            (SELECT graft_bloom_filter_agg(xxhash64(fp),
                      CAST($expectedItems AS BIGINT), CAST($numBits AS BIGINT))
             FROM graft_bloom_batch_fps),
            xxhash64(fp))""")
  }

  /** Exact-fingerprint incremental dedup with the bloom-pruned corpus
    * scan: intra-batch dups collapse to the smallest doc_id, then only
    * bloom-surviving corpus fingerprints enter the anti-join. Result is
    * provably identical to the unpruned anti-join (no false negatives);
    * only the corpus-side shuffle width changes. The near-dup stages
    * stay with dd_incremental/dd_incremental_lsh — this operator is the
    * exact layer a 100 TB pipeline runs on every arriving batch. */
  def incrementalDedupBloom(spark: SparkSession, newDocs: DataFrame,
                            corpus: DataFrame): DataFrame = {
    val w = Window.partitionBy("fp").orderBy("doc_id")
    val batchKeep = Scale.fanOut(newDocs, Seq("doc_id"))
      .withColumn("fp", contentFingerprint(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val corpusFps = Scale.fanOut(corpus.select("doc_id", "text"), Seq("doc_id"))
      .select(contentFingerprint(col("text")).as("fp")).distinct()
    val pruned = bloomPrunedFps(spark, corpusFps, batchKeep.select("fp"))
    batchKeep.join(pruned, Seq("fp"), "left_anti")
      .select("doc_id", "n_chars")
  }

  /** The 100 TB incremental path: same admit semantics as
    * incrementalDedup but against the STORED index — fingerprint
    * anti-join on the fp store, then banded MinHash matching on the
    * sketch store (SketchDedup.minhashMatchesIndex). Near-dup recall is
    * the LSH estimate's, property-tested against the exact twin. */
  def incrementalDedupLsh(spark: SparkSession, newDocs: DataFrame,
                          indexPath: String, n: Int = 3, k: Int = 32,
                          bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val w = Window.partitionBy("fp").orderBy("doc_id")
    val batchKeep = Scale.fanOut(newDocs, Seq("doc_id"))
      .withColumn("fp", contentFingerprint(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val cand = batchKeep
      .join(spark.read.parquet(s"$indexPath/fps"), Seq("fp"), "left_anti")
      .drop("fp")
    val sketches = spark.read.parquet(s"$indexPath/sketches")
    require(sketches.columns.contains("sketch_family"),
      s"stale sketch index at $indexPath (pre-$SketchFamily format): " +
        "band keys from a different hash family never match — rebuild " +
        "with buildDedupIndex")
    val matched = SketchDedup
      .minhashMatchesIndex(cand, sketches.drop("sketch_family"),
        n, k, bands, threshold)
      .select(col("new_id").as("doc_id")).distinct()
    cand.join(matched, Seq("doc_id"), "left_anti")
      .select("doc_id", "n_chars")
  }
}
