package graft.streaming

import graft.operators.Dwh
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** STREAMING accumulating-snapshot maintenance — the speed twin of
  * dwh_accumulating: every micro-batch of lifecycle events merges into
  * the persistent snapshot through `Dwh.accumulatingApply`, whose
  * `least`-merge is idempotent and order-insensitive — so at-least-once
  * redelivery, out-of-order batches and whole replays all converge to
  * the batch rebuild (the spec's equality). State is the
  * process-instance-count-sized snapshot itself, rewritten per batch
  * behind a temp-dir swap (read-modify-overwrite of the SAME path would
  * corrupt on failure mid-write; the swap keeps the previous snapshot
  * until the new one is fully on disk).
  */
object AccumulatingSink {

  def applyBatch(batch: DataFrame, statePath: String,
                 milestones: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(statePath))
    val merged =
      if (exists)
        Dwh.accumulatingApply(spark.read.parquet(statePath), batch,
          milestones)
      else Dwh.accumulatingSnapshot(batch, milestones)
    val tmp = s"$statePath.__next"
    merged.write.mode("overwrite").parquet(tmp)
    if (exists) fs.delete(new org.apache.hadoop.fs.Path(statePath), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(statePath))
  }

  def sink(stream: DataFrame, statePath: String, checkpoint: String,
           milestones: Seq[String] = Seq("signup", "click", "purchase"))
      : DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, statePath, milestones)
      }

  def snapshot(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(statePath)
}
