package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the unbounded twin of the batch
  * `operators/TemporalJoins` 30-min-gap sessionizer: events are grouped
  * into per-user sessions AS THEY ARRIVE, a session closing either when a
  * later event for the same user arrives past the gap (on-arrival split)
  * or when the event-time watermark passes its last event + gap
  * (event-time timeout). Emitted rollups are identical to the batch
  * operator's (same ordinal session ids, same decimal-exact value sums).
  *
  * Scale: state is one small record per user (the open session's rollup
  * plus the next session ordinal — the event list itself never enters
  * state), hash-partitioned on user_id across executors, the same
  * "state on the shuffle key" rule as [[StreamingDedup]]. The ordinal
  * counter makes per-user state permanent by design (it IS the session
  * numbering a user's history defines); a deployment that doesn't need
  * batch-identical ordinals can key sessions by start time instead and
  * evict idle users with a second timeout horizon.
  *
  * Determinism: within a micro-batch a user's events are folded in
  * (event-time, event_id) order, and value sums accumulate in scale-6
  * decimal exactly as the batch operator's `cast(decimal(28,6))` does
  * (`java.math.BigDecimal.valueOf` mirrors Catalyst's double→decimal
  * cast), so the emitted rollups are bit-identical to the batch twin
  * given in-event-time-order feeding.
  */
object StreamingSessionize {

  /** One arriving event (event time, user, tiebreak id, value). */
  final case class SessionEvent(ts: Timestamp, userId: Long, eventId: Long,
      value: Double)

  /** The open session's rollup (total kept as a scale-6 unscaled long). */
  final case class OpenSession(sessionId: Long, startUs: Long, endUs: Long,
      n: Long, totalScaled: Long)

  /** Per-user state: next session ordinal + the open session, if any. */
  final case class UserSessions(nextId: Long, open: Option[OpenSession])

  /** Closed-session rollup — the batch operator's output row. */
  final case class SessionRow(user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long, total_value: Double, duration_us: Long)

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Catalyst's double→decimal(_,6) cast goes through
    * `BigDecimal.valueOf(double)` (string-based) + HALF_UP — mirror it. */
  private def scaled6(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  private def toRow(uid: Long, s: OpenSession): SessionRow =
    SessionRow(uid, s.sessionId, s.n, s.startUs, s.endUs,
      new java.math.BigDecimal(
        java.math.BigInteger.valueOf(s.totalScaled), 6).doubleValue(),
      s.endUs - s.startUs)

  /** Gap-based streaming sessionization. `gapUs` in event-time micros
    * (default 30 min, the batch twin's gap); `watermarkDelay` bounds
    * accepted out-of-orderness — later events are dropped by the engine
    * before sessionization (same caveat as [[StreamingDedup]]).
    */
  def sessionizeStream(events: Dataset[SessionEvent],
      gapUs: Long = 1800L * 1000000L,
      watermarkDelay: String = "1 hour"): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[SessionEvent],
         state: GroupState[UserSessions]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's end + gap: close it but
            // KEEP the ordinal counter (no further timeout until a new
            // session opens)
            val s = state.get
            val out = s.open.map(toRow(uid, _)).toSeq
            state.update(UserSessions(s.nextId, None))
            out.iterator
          } else {
            var st = state.getOption.getOrElse(UserSessions(1L, None))
            val closed = Seq.newBuilder[SessionRow]
            it.toSeq.sortBy(e => (micros(e.ts), e.eventId)).foreach { e =>
              val eUs = micros(e.ts)
              st.open match {
                case Some(o) if eUs - o.endUs <= gapUs =>
                  st = st.copy(open = Some(o.copy(endUs = eUs, n = o.n + 1,
                    totalScaled = o.totalScaled + scaled6(e.value))))
                case other =>
                  other.foreach(o => closed += toRow(uid, o))
                  st = UserSessions(st.nextId + 1,
                    Some(OpenSession(st.nextId, eUs, eUs, 1L, scaled6(e.value))))
              }
            }
            state.update(st)
            // timeout only while a session is open (ms granularity: the
            // engine fires once the watermark passes end + gap)
            st.open.foreach(o =>
              state.setTimeoutTimestamp(o.endUs / 1000L + gapUs / 1000L + 1L))
            closed.result().iterator
          }
      }
  }
}
