package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Skew and co-location utilities (SURVEY §4).
  *
  * AQE's skew-join split handles most sort-merge skew at runtime; manual
  * salting remains the tool when one side must be replicated anyway
  * (hot-key dimension joins) or when AQE can't see the skew (custom
  * partitioners, streaming state). Bucketing pre-shuffles a table ONCE at
  * write time so every later equi-join/aggregation on the bucket key runs
  * exchange-free — the right trade for fact tables joined daily at 100 TB.
  */
object Scale {

  /** Salted equi-join: the large side gets a deterministic per-row salt,
    * the small side is replicated `salts`× — a hot key on the large side
    * spreads over `salts` tasks instead of one straggler. Result equals
    * the plain join (oracle-checked in the driver contract). */
  def saltedJoin(large: DataFrame, small: DataFrame,
                 largeKey: String, smallKey: String,
                 salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(struct(large.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall,
      saltedLarge(largeKey) === saltedSmall(smallKey) &&
        saltedLarge("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }

  /** Guard scan-stage parallelism for CPU-dense operators (sketching,
    * shingling, vector math). A 100 TB table arrives as tens of
    * thousands of splits and this is a no-op; a small extract (or a
    * single-row-group parquet file, which Spark cannot split) arrives
    * as ONE task and would serialize all per-row compute on one core.
    * The check is plan-metadata only (no job); the repartition moves a
    * small input once and buys full-width CPU for everything above it. */
  def fanOut(df: DataFrame, keys: Seq[String] = Nil): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.max(2, target / 2)) df
    else if (keys.nonEmpty) df.repartition(target, keys.map(col): _*)
    else df.repartition(target)
  }

  /** Band-explode a sketch frame (must carry a `bks` band-key array and
    * a unique `ord` column) into (…, band, key) rows, capped: rows whose
    * (band, key) bucket exceeds `cap` are dropped, and every surviving
    * row carries an `over_bands` array listing its band positions whose
    * bucket is over-cap. Carrying `over_bands` lets bandJoinFirstAgree
    * dedup on the first UNDER-cap agreeing band, so a pair is lost only
    * when EVERY agreeing band is over-cap — not whenever its first
    * agreeing band happens to be (the round-2 recall regression).
    *
    * Shuffle shape: the input is localCheckpoint'ed ONCE before the plan
    * branches — Catalyst recomputes shared subtrees per branch, and the
    * sketch frame sits above the corpus scan + signature compute, the
    * most expensive stage of the pipeline (the round-3 formulation paid
    * it twice). The census then runs on a NARROW (ord, band, key)
    * projection of the checkpoint; only rows actually IN an over-cap
    * bucket (rare by construction — boilerplate buckets) survive the
    * inner join + groupBy(ord), so the flags frame is tiny and the join
    * back onto the checkpoint broadcasts at runtime instead of the
    * round-3 full-width groupBy(ord) over every exploded row. */
  private[operators] def capBuckets(withBks: DataFrame, ord: String, cap: Int,
      band: String = "band", key: String = "band_key"): DataFrame = {
    val snap = withBks.localCheckpoint(true)
    val narrow = snap.select(col(ord), posexplode(col("bks")).as(Seq(band, key)))
    val hot = narrow.groupBy(band, key).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > cap)
      .select(col(band).as("__hb"), col(key).as("__hk"))
    val overBands = narrow
      .join(hot, col(band) === col("__hb") && col(key) === col("__hk"))
      .groupBy(ord).agg(collect_list(col(band)).as("over_bands"))
    snap.join(overBands, Seq(ord), "left")
      .withColumn("over_bands",
        coalesce(col("over_bands"), array().cast("array<int>")))
      .select((snap.columns.map(col) :+ col("over_bands") :+
        posexplode(col("bks")).as(Seq(band, key))).toIndexedSeq: _*)
      .filter(!array_contains(col("over_bands"), col(band)))
  }

  /** Self-join a banded sketch frame on (band, key) and keep each pair
    * exactly once via the first-usable-agreeing-band predicate: the row
    * whose band index equals the first position where the two full
    * band-key arrays (`bks`, carried on every row) agree AND that band
    * is not in `over_bands` (from capBuckets; at an agreeing band both
    * sides share the bucket, so x's flag equals y's). Row-local dedup —
    * no candidate-wide distinct() shuffle. Shared by the MinHash,
    * SimHash and embedding-LSH pair generators; `ord` orders the pair
    * (x < y). A pair drops only if every agreeing band is over-cap. */
  private[operators] def bandJoinFirstAgree(banded: DataFrame, ord: String,
      band: String = "band", key: String = "band_key"): DataFrame =
    banded.as("x").join(banded.as("y"),
        col(s"x.$band") === col(s"y.$band") &&
        col(s"x.$key") === col(s"y.$key") &&
        col(s"x.$ord") < col(s"y.$ord"))
      .filter(col(s"x.$band") ===
        array_position(
          transform(
            zip_with(col("x.bks"), col("y.bks"), (p, q) => p === q),
            (agree, i) => agree && !array_contains(col("x.over_bands"), i)),
          true) - 1)

  /** Write a table bucketed (and sorted) by `key`: one shuffle now,
    * exchange-free equi-joins/aggregations on `key` forever after — the
    * shuffle is paid once when the fact table lands, not by every one
    * of the day's queries (PlanAuditSpec + ScaleSpec assert the
    * exchange-free join). Pass `path` to keep the data in the lake
    * (external table) instead of the warehouse dir. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
