package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Feat(x1: Double, x2: Double, x3: Double, y: Double)

class OnlineSgdSpec extends SparkSpec {

  // three deterministic micro-batches of a separable concept
  // (y = [x1 + x2 > 0]) with a bit of feature noise in x3
  private def mk(seed: Int, n: Int): Seq[Feat] =
    (1 to n).map { i =>
      val a = math.sin(seed * 1000 + i * 7.3)
      val b = math.cos(seed * 2000 + i * 3.1)
      Feat(a, b, math.sin(i * 0.37), if (a + b > 0) 1.0 else 0.0)
    }

  test("online SGD sink: stream state equals the offline sequential fold; replay converges") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = s"/root/repo/target/graft_io/sgd_${System.nanoTime()}"
    val batches = Seq(mk(1, 200), mk(2, 200), mk(3, 200))

    def runOnce(ckpt: String): Unit = {
      val input = MemoryStream[Feat](Encoders.product[Feat], sq)
      val q = OnlineSgdSink.sink(input.toDF(), s"$dir/state", s"$dir/$ckpt")
        .outputMode("update").start()
      try batches.foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      } finally q.stop()
    }

    runOnce("ckpt_a")
    val state = spark.read.parquet(s"$dir/state")
    assert(state.count() == 3, "one weight row per micro-batch")
    val sRow = state.orderBy(col("__batch").desc).limit(1).collect().head
    val streamed = sRow.getSeq[Double](sRow.fieldIndex("w")).toList

    // offline: the same three frames folded through the same step
    val offline = batches.foldLeft(Array.fill(4)(0.0)) { (w, b) =>
      Stats.logisticStep(b.toDF(), w, lr = 5.0)
    }.toList
    // partition-order double summation drifts at the last ulp between
    // the streamed frame and the local fold; the fold itself is what's
    // under test, so compare within 1e-9 relative
    assert(streamed.size == offline.size && streamed.zip(offline).forall {
      case (a, b) => math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
    }, s"stream fold $streamed != offline fold $offline")

    // the trained model actually separates the concept
    val acc = batches.flatten.count(f =>
      (offline(0) + offline(1) * f.x1 + offline(2) * f.x2 +
        offline(3) * f.x3 >= 0) == (f.y == 1.0)).toDouble / 600
    assert(acc > 0.8, s"3 online steps must beat chance clearly: $acc")

    // fresh-checkpoint replay: batch ids restart, and each batch reads
    // the state strictly below its id, so the fold reproduces exactly
    runOnce("ckpt_b")
    val rRow = spark.read.parquet(s"$dir/state")
      .orderBy(col("__batch").desc).limit(1).collect().head
    val replayed = rRow.getSeq[Double](rRow.fieldIndex("w")).toList
    assert(replayed == streamed, "replay must converge to the same model")
    assert(spark.read.parquet(s"$dir/state").count() == 3,
      "replay overwrites its partitions, never appends")
  }
}
