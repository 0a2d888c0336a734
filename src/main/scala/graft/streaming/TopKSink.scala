package graft.streaming

import graft.operators.Stats
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** STREAMING HEAVY-HITTERS as a stream sink — the speed twin of
  * st_freq_topn: every micro-batch lands its per-value counts in a
  * persistent store and [[report]] answers "what are the top-k values
  * so far" at any moment without rescanning history — the live
  * trending-values loop next to AbMonitorSink's live experiment.
  *
  * State design: per-value counts are MERGEABLE (counts add across
  * batches), so the store is append-only per-batch rollups in a
  * `__batch`-partitioned lake with dynamic overwrite — a replayed
  * micro-batch recomputes the same rollup from the same data and
  * overwrites its own partition with identical bytes (the NbModelSink
  * discipline: at-least-once redelivery converges, nothing
  * double-counts). No state is read on the write path.
  *
  * Scale shape: the per-batch increment is one map-side-combined
  * value rollup over the batch; the store grows by
  * distinct-values-per-batch rows (value-cardinality-bounded, not
  * event-bounded); [[report]] collapses it in one rollup and ranks
  * through [[Stats.topNFromCounts]] — the SAME ordering/tiebreak as
  * the batch st_freq_topn, one definition, two surfaces. (For
  * unbounded value domains at 100 TB, cap the stored rows per batch
  * at a generous top-M ≫ k — the classic SpaceSaving-style guard;
  * the contract domain is small enough to store exactly.)
  */
object TopKSink {

  /** One micro-batch of per-value count partials — also the backfill
    * twin. */
  def incrementsBatch(batch: DataFrame, batchId: Long, statePath: String,
                      c: String): Unit = {
    batch.groupBy(c)
      .agg(count(lit(1)).as("n"))
      .withColumn("__batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch")
      .parquet(statePath)
  }

  /** The live top-k over every stored partial: one merge rollup, then
    * the batch ranking verbatim. */
  def report(spark: SparkSession, statePath: String, c: String,
             k: Int): DataFrame =
    Stats.topNFromCounts(
      spark.read.parquet(statePath)
        .groupBy(c).agg(sum("n").as("n")), c, k)

  def sink(stream: DataFrame, statePath: String, checkpoint: String,
           c: String): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        incrementsBatch(batch, id, statePath, c)
      }
}
