package graft.streaming

import graft.operators.Windows
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** STREAMING GROWTH ACCOUNTING — the speed twin of
  * w28_growth_accounting: each micro-batch lands its distinct
  * (user, week) activity partials in a persistent store, and
  * [[report]] rebuilds the full new/retained/resurrected/churned
  * ledger at any moment — the live growth dashboard without a nightly
  * batch.
  *
  * State design: (user, week) activity is MERGEABLE (a user active in
  * any batch that week is active that week — distinct-union), so the
  * store is append-only per-batch distinct partials in a
  * `__batch`-partitioned lake with dynamic overwrite (the NbModelSink
  * discipline: a replayed micro-batch rewrites its own partition with
  * identical bytes; at-least-once redelivery converges). No state is
  * read on the write path.
  *
  * Report = ONE distinct-union of the store fed through the SAME
  * [[Windows.growthAccounting]] ledger the batch surface runs — one
  * definition, two surfaces; the spec pins streamed ≡ batch on the
  * union including the cross-batch resurrection case. */
object GrowthSink {

  def incrementsBatch(batch: DataFrame, batchId: Long,
                      statePath: String): Unit = {
    batch
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("week"))
      .distinct()
      .withColumn("__batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch")
      .parquet(statePath)
  }

  /** The live ledger over every stored partial: distinct-merge, then
    * the batch ledger verbatim (growthAccounting re-collapses to
    * distinct (user, week) itself, so feeding it week-start
    * timestamps is exact). */
  def report(spark: SparkSession, statePath: String): DataFrame =
    Windows.growthAccounting(
      spark.read.parquet(statePath)
        .select(col("user_id"), col("week").cast("timestamp").as("ts")))

  def sink(stream: DataFrame, statePath: String,
           checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        incrementsBatch(batch, id, statePath)
      }
}
