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

  /** Write a table bucketed (and sorted) by `key`: one shuffle now,
    * exchange-free equi-joins/aggregations on `key` forever after. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
