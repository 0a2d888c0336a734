package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data assembly (SURVEY §2.G).
  *
  * Every operator here derives its randomness from a salted md5 of the
  * ROW ID, never from an RNG: the same corpus always yields the same
  * sample regardless of partitioning, task retries, cluster size, or
  * corpus growth (a doc's fate never changes when its neighbors
  * change) — the reproducibility a 100 TB pipeline needs, and what
  * makes these oracle-checkable in DuckDB (`rand()`-based sampling is
  * engine-specific, see st_sample).
  *
  * Scale shapes: mixture sampling is a row-local filter/explode below
  * any shuffle (zero exchanges, pushdown-friendly); the stratified
  * sampler's rank-filter plans as a map-side WindowGroupLimit (hot
  * strata prune before the exchange); the shuffle writer has exactly
  * one exchange on the shard key.
  */
object Sampling {

  /** Salted content-id hash, first `len` lowercase hex chars — the
    * deterministic uniform in [0, 16^len) every sampler compares
    * against. md5 (not xxhash64) because the oracle engine computes
    * the identical digest. */
  private def hexKey(salt: String, id: Column, len: Int): Column =
    substring(md5(concat(lit(salt), id.cast("string"))), 1, len)

  /** 4-hex-digit threshold for probability `p`: hexKey < threshold
    * keeps a p-fraction. p >= 1 maps to "zzzz" ( > every hex string —
    * always keep) so integral weights need no comparison special-case. */
  private def hexThreshold(p: Double): String =
    if (p >= 1.0) "zzzz"
    else f"${math.max(0, math.round(p * 65536).toInt)}%04x"

  /** Domain-mixture resampling: each domain's rows are kept/repeated to
    * hit a target weight — the "mix web at 0.3, wiki at 2.0" step that
    * turns a raw corpus into a training mixture. A weight w produces
    * floor(w) deterministic copies plus one more with probability
    * frac(w), decided per-row by the salted hash; `copy` indexes the
    * repeats so downstream packing sees distinct rows. Domains absent
    * from `weights` default to weight 0 (dropped).
    *
    * Row-local: the copy count is a pure column expression, the repeat
    * an explode — no shuffle, no RNG, no driver state. Upsampled
    * copies are deterministic too: corpus growth or re-runs never flip
    * an existing row's fate. */
  def mixtureSample(df: DataFrame, idCol: String, domainCol: String,
                    weights: Map[String, Double],
                    salt: String = "mix"): DataFrame = {
    val whole: Column = weights.foldLeft(lit(0)) { case (acc, (dom, w)) =>
      when(col(domainCol) === dom, lit(w.toInt)).otherwise(acc)
    }
    val fracThr: Column = weights.foldLeft(lit("0000")) { case (acc, (dom, w)) =>
      when(col(domainCol) === dom, lit(hexThreshold(w - w.toInt))).otherwise(acc)
    }
    df.withColumn("__n",
        whole + when(hexKey(salt, col(idCol), 4) < fracThr, 1).otherwise(0))
      .filter(col("__n") > 0)
      // sequence() counts DOWN when start > stop, so the n=0 case must
      // be filtered out above rather than relied on to explode to empty
      .select(col(idCol), col(domainCol),
        explode(sequence(lit(0), col("__n") - 1)).as("copy"))
  }

  /** Global deterministic pseudo-shuffle: order the corpus by a salted
    * content hash and cut it into 16^`shardChars` shards — the "shuffle
    * once, train many epochs" layout. A row's shard depends only on its
    * own id (stable under corpus growth); `pos` is its rank within the
    * shard. One exchange on the shard key; within-shard ranking uses
    * the same striped prefix-sum escape hatch as pipe_pack if a single
    * shard ever outgrows a task (16^2 = 256 shards keeps shards ≪
    * executor-sized at any corpus the shard count suits). */
  def deterministicShuffle(df: DataFrame, idCol: String,
                           salt: String = "shuf",
                           shardChars: Int = 2): DataFrame = {
    val h = md5(concat(lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy("shard").orderBy("__h", idCol)
    df.select(col(idCol), substring(h, 1, shardChars).as("shard"),
        h.as("__h"))
      .withColumn("pos", row_number().over(w))
      .drop("__h")
  }

  /** Stratified fixed-size sample: the `k` rows with the smallest
    * salted hash per stratum — deterministic equal-allocation sampling
    * (eval-set construction, per-language probes). Strata smaller than
    * k are taken whole. The rank-filter plans as a map-side
    * WindowGroupLimit: each task keeps at most k rows per stratum
    * before the exchange, so a billion-row stratum ships k rows per
    * task, not its population. */
  def stratifiedFixed(df: DataFrame, idCol: String, stratumCol: String,
                      k: Int, salt: String = "strat"): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy("__h", idCol)
    df.withColumn("__h", hexKey(salt, col(idCol), 32))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__h", "__rn")
  }

  /** Class-balanced downsampling: every class keeps exactly m rows
    * (m = the smallest class's population), chosen as the m smallest
    * salted hashes per class — the deterministic "equalize the label
    * distribution" step before training, same reproducibility contract
    * as every sampler here.
    *
    * Auto-deriving m makes the cap a COLUMN, so the rank filter cannot
    * prune map-side (no WindowGroupLimit) — the per-class sort is the
    * price of exact auto-balance. When the per-class budget is known up
    * front (the usual case for eval sets), [[stratifiedFixed]] with
    * k = budget draws the IDENTICAL sample with the map-side limit. */
  /** Per-row WEIGHTED Bernoulli keep — importance sampling for data
    * curation ("keep long/high-quality docs more often"): row kept iff
    * its salted uniform u < p(row), p any column expression clamped to
    * [0, 1−2⁻²⁴]. The comparison stays in fixed-width lowercase hex on
    * both engines (6 digits = 24 bits of the digest vs printf'd
    * ⌊p·16⁶⌋), so no float parsing of hash bits anywhere. Pure map-side
    * filter: no shuffle, no RNG state, reruns and corpus growth never
    * flip an existing row's fate. */
  def weightedSample(df: DataFrame, idCol: String, pCol: Column,
                     salt: String = "wt"): DataFrame = {
    val p = greatest(lit(0.0), least(pCol, lit(1.0 - 1.0 / (1 << 24))))
    val thr = lower(lpad(hex(floor(p * (1 << 24)).cast("long")), 6, "0"))
    df.filter(hexKey(salt, col(idCol), 6) < thr)
  }

  def classBalance(df: DataFrame, idCol: String, classCol: String,
                   salt: String = "bal"): DataFrame = {
    val m = df.groupBy(classCol).agg(count(lit(1)).as("__c"))
      .agg(min("__c").as("__m"))
    val w = Window.partitionBy(classCol).orderBy("__h", idCol)
    df.withColumn("__h", hexKey(salt, col(idCol), 32))
      .withColumn("__rn", row_number().over(w))
      .crossJoin(broadcast(m))
      .filter(col("__rn") <= col("__m"))
      .drop("__h", "__rn", "__m")
  }

  /** Deterministic train/val/test assignment — the split every training
    * corpus needs BEFORE any epoch runs. A row's split is a pure
    * function of its own id (salted md5, first two hex chars = one of
    * 256 buckets; percent thresholds map to bucket-count cut points
    * compared AS HEX STRINGS — '0'-'9' < 'a'-'f' holds in every
    * engine). Row-local and shuffle-free, stable under corpus growth
    * (new rows never move old rows across splits — the property that
    * keeps eval sets uncontaminated as the lake appends), and
    * reproducible from the salt alone.
    *
    * Percent thresholds are in 1/256 granularity by design: exact
    * bucket membership beats a float comparison the oracle engine
    * might round differently. */
  def trainValTestSplit(df: DataFrame, idCol: String,
                        trainPct: Int = 80, valPct: Int = 10,
                        salt: String = "split"): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      "need three non-empty splits")
    val trainHi = f"${math.round(256.0 * trainPct / 100).toInt}%02x"
    val valHi = f"${math.round(256.0 * (trainPct + valPct) / 100).toInt}%02x"
    val b = hexKey(salt, col(idCol), 2)
    df.select(col(idCol),
      when(b < trainHi, "train").when(b < valHi, "val").otherwise("test")
        .as("split"))
  }
}
