package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom streaming state via KeyValueGroupedDataset — the
  * `mapGroupsWithState`/`flatMapGroupsWithState` tier of SURVEY §7.2 M5.
  *
  * [[sessionizeStream]] is the streaming twin of
  * [[StreamingOps.st2Sessionize]]: same >30-minute-gap semantics, expressed
  * as per-user state (the running session) that emits a session row when a
  * gap closes it and evicts itself via event-time timeout. State per key is
  * O(1) — a (session_no, start, end, count) tuple — so total state is one
  * tuple per live user regardless of stream length.
  */
object StatefulOps {

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long)
  case class SessState(sessionNo: Long, start: Timestamp, end: Timestamp, n: Long)
  case class Session(user_id: Long, session_no: Long, n_events: Long,
      sess_start: Timestamp, sess_end: Timestamp)

  val GapMs: Long = 30 * 60 * 1000
  /** Gap in exact microseconds — the unit both the batch twin and the
    * DuckDB oracle compare in (whole-second truncation would disagree
    * with them on fractional-second gaps). */
  val GapUs: Long = GapMs * 1000

  /** Microseconds since epoch, exact (Timestamp.getTime alone truncates
    * to milliseconds). */
  @inline private def micros(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  /** Streaming sessionization. Out-of-order tolerance, in two layers:
    * events within a group-state invocation are sorted by (ts, event_id),
    * and a LATE event arriving in a later batch merges into the running
    * session with min/max endpoint widening — which is always correct,
    * because a late event that survives the 30-minute watermark is
    * provably within the gap of the running session (e >= watermark >=
    * session_end − gap, and end ≥ start rules out a predating session).
    * Events older than the watermark are dropped by Spark before the
    * function sees them — the documented streaming/batch divergence every
    * watermarked operator accepts. Emits CLOSED sessions; the final open
    * session per user flushes on timeout. */
  def sessionizeStream(events: Dataset[Ev]): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessState]
    implicit val longEnc = Encoders.scalaLong
    // Event-time timeout needs a watermark: it is what advances the clock
    // that fires session-closing timeouts and lets Spark drop state.
    val in = if (events.isStreaming) {
      implicit val evEnc = Encoders.product[Ev]
      events.withWatermark("ts", "30 minutes").as[Ev]
    } else events
    in.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.sessionNo, s.n, s.start, s.end))
          } else {
            val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val closed = Vector.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if micros(e.ts) - micros(s.end) <= GapUs =>
                  // min/max, not assignment: a late cross-batch event must
                  // widen the session, never regress its endpoints
                  val st = if (micros(e.ts) < micros(s.start)) e.ts else s.start
                  val en = if (micros(e.ts) > micros(s.end)) e.ts else s.end
                  cur = Some(s.copy(start = st, end = en, n = s.n + 1))
                case Some(s) =>
                  closed += Session(userId, s.sessionNo, s.n, s.start, s.end)
                  cur = Some(SessState(s.sessionNo + 1, e.ts, e.ts, 1))
                case None =>
                  cur = Some(SessState(0L, e.ts, e.ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Close the open session once event time passes its gap
              // window. +1 ms: getTime truncates sub-millisecond micros,
              // so without the ceil the timeout could fire up to 999 µs
              // BEFORE the exact micros boundary the gap test uses.
              state.setTimeoutTimestamp(s.end.getTime + GapMs + 1)
            }
            closed.result().iterator
          }
      }
  }
}
