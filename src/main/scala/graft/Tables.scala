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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4.1 refuses to
    * read as a timestamp ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and
    * normalize to a microsecond timestamp (floor division — matches
    * DuckDB's ns→us cast semantics, so oracles align exactly). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
