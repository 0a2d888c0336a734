package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class TtlSessionSpec extends SparkSpec {

  private def ev(id: Long, minute: Int, user: Long): StatefulSessions.Ev =
    StatefulSessions.Ev(id,
      java.sql.Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00"),
      user, 1.0)

  test("TTL sessionizer assigns gap sessions and expires idle state") {
    implicit val sq = spark.sqlContext
    implicit val enc = Encoders.product[StatefulSessions.Ev]
    val input = MemoryStream[StatefulSessions.Ev](enc, sq)
    val withWm = input.toDS()
      .withWatermark("ts", "0 seconds")
      .as[StatefulSessions.Ev](enc)
    val q = StatefulSessions.sessionizeWithTtl(withWm, gapMinutes = 30, ttlMinutes = 60)
      .writeStream.format("memory").queryName("t_ttl").outputMode("update").start()
    try {
      input.addData(ev(1, 0, 7), ev(2, 10, 7)) // session 1
      q.processAllAvailable()
      input.addData(ev(3, 50, 7)) // 40min gap > 30 → session 2
      q.processAllAvailable()
      // idle far beyond TTL: another user's event advances the watermark,
      // user 7's state must expire; then user 7 returns → numbering resets
      input.addData(ev(4, 600, 8))
      q.processAllAvailable()
      input.addData(ev(5, 610, 7))
      q.processAllAvailable()
      val out = spark.table("t_ttl").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_no")).toMap
      assert(out(1L) == 1L && out(2L) == 1L)
      assert(out(3L) == 2L)
      assert(out(4L) == 1L)
      assert(out(5L) == 1L, s"state should have expired, got ${out(5L)}")
    } finally q.stop()
  }
}
