package graft.operators

import graft.functions.TextFunctions.shingles
import graft.plans.{MinHashSignature, SimHash64}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based near-dup detection — the 100 TB path (SURVEY §2.G).
  *
  * Exact n-gram Jaccard (Dedup.ngramJaccardPairs) explodes ~|doc| shingle
  * rows per document into a shuffle. Here signatures are computed
  * row-local inside the scan (native expressions, no explode), and only
  * compact keys shuffle:
  *   - MinHash-LSH: b band keys per doc (b≈8), candidates = band-key
  *     hash-join, verified by signature agreement.
  *   - SimHash: one i64 per doc, banded into 16-bit chunks; candidates
  *     verified by Hamming distance (bit_count(xor)).
  * Hot band buckets (boilerplate documents) are the classic skew risk:
  * bucket sizes are capped before pairing, which bounds the quadratic
  * expansion per bucket; AQE skew-join handles the join-side skew.
  */
object SketchDedup {

  private def minhashCol(tokens: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(tokens), k))

  private def simhashCol(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** doc_id + k-slot MinHash signature, computed in the scan. */
  def withMinHashSignature(documents: DataFrame, n: Int = 3, k: Int = 32): DataFrame =
    documents.select(col("doc_id"),
      minhashCol(shingles(col("text"), n), k).as("sig"))

  /** Candidate pairs from LSH banding + signature-agreement estimate.
    * k slots, `bands` bands of k/bands rows; pairs estimated below
    * `threshold` are dropped. `bucketCap` bounds per-bucket expansion. */
  def minhashLshPairs(documents: DataFrame, n: Int = 3, k: Int = 32,
                      bands: Int = 8, threshold: Double = 0.5,
                      bucketCap: Int = 64): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sigs = withMinHashSignature(documents, n, k)

    val banded = sigs.select(col("doc_id"), posexplode(
      array((0 until bands).map(j =>
        xxhash64(lit(j), slice(col("sig"), j * r + 1, r))): _*)))
      .toDF("doc_id", "band", "band_key")

    // cap pathological buckets (boilerplate): keeps expansion bounded
    val capped = banded
      .withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band", "band_key")))
      .filter(col("bucket_n") <= bucketCap)

    val candidates = capped.select(col("band"), col("band_key"), col("doc_id").as("d1"))
      .join(capped.select(col("band"), col("band_key"), col("doc_id").as("d2")),
        Seq("band", "band_key"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()

    val est = candidates
      .join(sigs.select(col("doc_id").as("d1"), col("sig").as("sig1")), "d1")
      .join(sigs.select(col("doc_id").as("d2"), col("sig").as("sig2")), "d2")
      .withColumn("est_jaccard",
        round(aggregate(
          zip_with(col("sig1"), col("sig2"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / k, 6))
    est.filter(col("est_jaccard") >= threshold)
      .select("d1", "d2", "est_jaccard")
  }

  /** doc_id + 64-bit SimHash, computed in the scan. */
  def withSimHash(documents: DataFrame, n: Int = 3): DataFrame =
    documents.select(col("doc_id"),
      simhashCol(shingles(col("text"), n)).as("sim"))

  /** Brute-force SimHash pairing: all-pairs XOR + popcount. Measured at
    * sf0.1 it costs the same as banding on this homogeneous corpus
    * (BroadcastNestedLoopJoin materializes every candidate row outside
    * codegen, which dominates either way); it exists as the simple
    * reference implementation and the banded/brute equivalence check.
    * Identical output to simhashPairs. */
  def simhashPairsBrute(documents: DataFrame, n: Int = 3,
                        maxHamming: Int = 3): DataFrame = {
    val sims = withSimHash(documents, n)
    val a = sims.select(col("doc_id").as("d1"), col("sim").as("s1"))
    val b = sims.select(col("doc_id").as("d2"), col("sim").as("s2"))
    a.join(b, col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("s1").bitwiseXOR(col("s2"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Adaptive strategy (AQE-spirit): the corpus row count is one
    * metadata-cheap action; below `bruteCutoff` the quadratic-but-cheap
    * scan wins, above it banding bounds the work. Both produce exactly
    * the hamming<=maxHamming pair set. */
  def simhashPairsAuto(documents: DataFrame, n: Int = 3, maxHamming: Int = 3,
                       bruteCutoff: Long = 100000L): DataFrame =
    if (documents.count() <= bruteCutoff) simhashPairsBrute(documents, n, maxHamming)
    else simhashPairs(documents, n, maxHamming)

  /** Near-dup pairs by SimHash: band the 64 bits into 4×16-bit keys
    * (any pair within Hamming distance 3 shares at least one chunk),
    * join on chunk, verify with bit_count(xor) <= maxHamming.
    *
    * Caveat measured at sf0.1: on a HOMOGENEOUS corpus (shared
    * vocabulary) simhashes cluster, chunk buckets inflate, and the
    * banded join degenerates toward all-pairs — the hamming predicate
    * inside the join keeps it correct but not cheap. At web scale with
    * heterogeneous content buckets stay small; for small/homogeneous
    * corpora brute-force bit_count over all pairs is cheaper (64-bit
    * XOR is ~free compared to bucket-shuffle overhead). */
  def simhashPairs(documents: DataFrame, n: Int = 3, maxHamming: Int = 3): DataFrame = {
    val sims = withSimHash(documents, n)
    val banded = sims.select(col("doc_id"), col("sim"), posexplode(
      array((0 until 4).map(j =>
        shiftrightunsigned(col("sim"), j * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("doc_id", "sim", "band", "chunk")
    banded.select(col("band"), col("chunk"), col("doc_id").as("d1"), col("sim").as("s1"))
      .join(banded.select(col("band"), col("chunk"), col("doc_id").as("d2"),
        col("sim").as("s2")), Seq("band", "chunk"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("s1").bitwiseXOR(col("s2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
