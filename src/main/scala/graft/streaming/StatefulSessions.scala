package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch gap-sessionizer (graft.operators.Windows
  * .sessionize): per-user session numbering over an unbounded stream via
  * `flatMapGroupsWithState` (reference: the TD cyclist trip numbering,
  * work/TD_pySpark.ipynb, which the reference could only do in batch —
  * this is the capability the reference's Kafka chapters point toward).
  *
  * State per user is O(1): (last event micros, current session number).
  * Events inside a micro-batch are sorted by event time before folding,
  * so in-order streams reproduce the batch assignment exactly (verified
  * in specs); late events across batches inherit best-effort semantics —
  * pair with a watermark-driven state TTL in production.
  */
object StatefulSessions {

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long, value: Double)

  // ---- streaming funnel (twin of operators.Windows.funnelStages) ----

  case class FunnelEv(event_id: Long, ts: java.sql.Timestamp,
                      user_id: Long, event_type: String)
  case class FunnelState(next: Int, t1: Long, t2: Long, t3: Long)
  case class FunnelRow(user_id: Long, funnel_depth: Int,
                       t1_us: Option[Long], t2_us: Option[Long],
                       t3_us: Option[Long])

  /** Per-user funnel progression over an unbounded stream: the stage
    * cursor and hit timestamps are the O(1) state, advanced per
    * micro-batch (batch rows sorted by (ts, event_id), so in-order
    * streams reproduce the batch operator exactly — spec-verified,
    * including progression SPLIT ACROSS batches, which no per-batch
    * computation can see). Emits the user's row whenever its depth
    * advances (Update mode). */
  def funnel(events: Dataset[FunnelEv],
             stages: Seq[String]): Dataset[FunnelRow] = {
    require(stages.nonEmpty && stages.size <= 3, "state carries t1..t3")
    implicit val outEnc = Encoders.product[FunnelRow]
    implicit val stEnc = Encoders.product[FunnelState]
    def us(e: FunnelEv): Long =
      e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[FunnelEv],
         state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, -1L, -1L, -1L))
          val before = st.next
          rows.toSeq.sortBy(e => (us(e), e.event_id)).foreach { e =>
            // strictly-after guard, mirroring the batch operator: the
            // previous hit's timestamp is the last stored t for the cursor
            val prev = st.next match {
              case 1 => st.t1; case 2 => st.t2; case _ => Long.MinValue
            }
            if (st.next < stages.size && e.event_type == stages(st.next) &&
                (st.next == 0 || us(e) > prev)) {
              val t = us(e)
              st = st.next match {
                case 0 => FunnelState(1, t, st.t2, st.t3)
                case 1 => FunnelState(2, st.t1, t, st.t3)
                case _ => FunnelState(3, st.t1, st.t2, t)
              }
            }
          }
          state.update(st)
          if (st.next == before) Iterator.empty
          else Iterator.single(FunnelRow(userId, st.next,
            Option(st.t1).filter(_ >= 0), Option(st.t2).filter(_ >= 0),
            Option(st.t3).filter(_ >= 0)))
      }
  }
  // ---- streaming transition tracking (twin of Windows.transitionMatrix) ----

  case class TransState(lastType: String, lastUs: Long, lastId: Long)
  case class TransitionInc(user_id: Long, from_type: String, to_type: String)

  /** Per-user event-type TRANSITION increments over an unbounded stream
    * — the streaming feed of the batch Markov matrix (w12_markov): each
    * consecutive (from, to) pair per user emits one increment row, and
    * the O(1) carried state (the user's LAST event) is what lets a pair
    * straddle a micro-batch boundary, which no per-batch window can see.
    * Downstream, any sink aggregates increments into counts/probs — the
    * increments themselves are append-only and replay-deterministic for
    * in-order streams. Batch rows sort by (ts, event_id) before folding,
    * matching the batch twin's ordering exactly (spec-verified equal
    * across split batches). */
  def transitions(events: Dataset[FunnelEv]): Dataset[TransitionInc] = {
    implicit val outEnc = Encoders.product[TransitionInc]
    implicit val stEnc = Encoders.product[TransState]
    def us(e: FunnelEv): Long =
      e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[FunnelEv],
         state: GroupState[TransState]) =>
          var st = state.getOption.getOrElse(TransState(null, Long.MinValue, Long.MinValue))
          val out = Seq.newBuilder[TransitionInc]
          rows.toSeq.sortBy(e => (us(e), e.event_id)).foreach { e =>
            if (st.lastType != null)
              out += TransitionInc(userId, st.lastType, e.event_type)
            st = TransState(e.event_type, us(e), e.event_id)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class SessionState(lastUs: Long, sessionNo: Long)
  case class SessionedEv(event_id: Long, user_id: Long, session_no: Long)

  def assign(gapMinutes: Int)(
      userId: Long, events: Iterator[Ev],
      state: GroupState[SessionState]): Iterator[SessionedEv] = {
    val gapUs = gapMinutes * 60L * 1000000L
    var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
    // full microseconds (getTime truncates to ms; parquet-derived inputs
    // carry µs) and the event_id tiebreak, matching the batch twin's
    // (ts, event_id) ordering exactly for ties and sub-ms gaps
    def us(e: Ev): Long = e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
    val out = events.toSeq.sortBy(e => (us(e), e.event_id)).map { e =>
      val eUs = us(e)
      st =
        if (st.sessionNo == 0L || eUs - st.lastUs > gapUs)
          SessionState(eUs, st.sessionNo + 1)
        else SessionState(eUs, st.sessionNo)
      SessionedEv(e.event_id, userId, st.sessionNo)
    }
    state.update(st)
    out.iterator
  }

  /** Works on both bounded and streaming Datasets (flatMapGroupsWithState
    * requires a streaming source for Update mode; for bounded inputs
    * Spark folds it in one pass). */
  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[SessionedEv] = {
    implicit val evEnc = Encoders.product[SessionedEv]
    implicit val stEnc = Encoders.product[SessionState]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(assign(gapMinutes))
  }

  /** Production variant: per-user state expires `ttlMinutes` of EVENT
    * time after the last activity (requires a watermark on the input).
    * An expired user restarts at session 1 — acceptable for gap
    * sessionization because any post-TTL event starts a new session
    * anyway; only the monotone numbering resets. Bounds total state to
    * the active-user set, which is what keeps an unbounded 100 TB/day
    * stream runnable. */
  def sessionizeWithTtl(events: Dataset[Ev], gapMinutes: Int = 30,
                        ttlMinutes: Int = 120): Dataset[SessionedEv] = {
    implicit val evEnc = Encoders.product[SessionedEv]
    implicit val stEnc = Encoders.product[SessionState]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = assign(gapMinutes)(userId, evs, state)
            // clamp to strictly after the current watermark: a group fed
            // only late events would otherwise compute a timeout <= the
            // watermark and setTimeoutTimestamp throws, failing the query
            val desired = state.get.lastUs / 1000L + ttlMinutes * 60L * 1000L
            state.setTimeoutTimestamp(
              math.max(desired, state.getCurrentWatermarkMs() + 1L))
            out
          }
      }
  }
}
