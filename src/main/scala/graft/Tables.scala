package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the lake tables (TPC-H-ish star schema plus `events`,
  * `documents`, `embeddings`).
  *
  * Parquet-first so Catalyst gets column pruning + predicate pushdown for
  * free on every scan (the reference's lake keeps a parquet "raw" layer for
  * the same reason — reference: work/Projet/preparation_noaa.ipynb, the
  * RAW_OUTPUT_PATH persistence step; multi-format schema-on-read is in
  * reference: work/Intro_pySpark.ipynb).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some data
    * drops (Spark 4.1 refuses to read nanos as a timestamp —
    * [PARQUET_TYPE_ILLEGAL] — so those are read as long via
    * `nanosAsLong` and floor-divided to micros, matching DuckDB's
    * ns→us cast) and as TIMESTAMP(MICROS, ntz) in others (read
    * natively as TIMESTAMP_NTZ). Normalize both to a session-tz
    * TimestampType column so every downstream operator and oracle
    * (session tz = UTC) sees identical instants. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType        =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
