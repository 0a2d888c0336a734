package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch rolling z-score detector
  * (graft.operators.Resample.tsAnomaly) — the unbounded form of the
  * reference's anomaly_detector.py: each user's last `lookback` values
  * ride as O(lookback) state, every arriving event scores against that
  * buffer BEFORE entering it (the batch frame ends at -1 for the same
  * reason: a spike must not dampen its own baseline).
  *
  * In-batch events are sorted by (event-time µs, event_id), matching
  * the batch operator's window ordering, so an in-order stream
  * reproduces it exactly — including anomalies whose baseline
  * accumulated in EARLIER micro-batches, which no per-batch window can
  * see (spec-verified against the batch twin with split batches).
  */
object AnomalySink {

  case class AnomEv(event_id: Long, ts: java.sql.Timestamp,
                    user_id: Long, value: Double)
  case class AnomState(values: Seq[Double])
  case class AnomRow(user_id: Long, event_id: Long, z: Double)

  def anomalies(events: Dataset[AnomEv], lookback: Int = 20,
                sigmas: Double = 2.0, minN: Int = 10): Dataset[AnomRow] = {
    implicit val outEnc = Encoders.product[AnomRow]
    implicit val stEnc = Encoders.product[AnomState]
    def us(e: AnomEv): Long =
      e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[AnomEv],
         state: GroupState[AnomState]) =>
          var buf = state.getOption.map(_.values.toVector)
            .getOrElse(Vector.empty[Double])
          val out = Vector.newBuilder[AnomRow]
          rows.toSeq.sortBy(e => (us(e), e.event_id)).foreach { e =>
            val n = buf.size
            if (n >= minN) {
              val mu = buf.sum / n
              // two-pass sample variance over ≤ lookback values — the
              // same statistic the batch stddev_samp frame computes
              val sd = math.sqrt(
                buf.map(x => (x - mu) * (x - mu)).sum / (n - 1))
              if (sd > 0 && math.abs(e.value - mu) > sigmas * sd) {
                val z = BigDecimal((e.value - mu) / sd)
                  .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
                out += AnomRow(userId, e.event_id, z)
              }
            }
            buf = (buf :+ e.value).takeRight(lookback)
          }
          state.update(AnomState(buf))
          out.result().iterator
      }
  }
}
