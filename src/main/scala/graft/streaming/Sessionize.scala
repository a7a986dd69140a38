package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming operator: event-time sessionization with
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset state API the
  * built-in windowing can't express (variable-length sessions closed by
  * inactivity gaps).
  *
  * Semantics: events for a user belong to one session while consecutive
  * gaps are ≤ `gapSeconds`; a session closes when the event-time watermark
  * passes its last event + gap (timeout) or a later event arrives beyond
  * the gap. State per key is one open session — bounded regardless of
  * stream length; the watermark bounds how long it is retained.
  *
  * Scale: state lives in the state store partitioned by user — the same
  * hash partitioning as any aggregation; no driver state, no unbounded
  * growth (timeout reaps idle keys).
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(start: Long, last: Long, n: Long, total: Double)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long, total_value: Double)

  def sessionize(events: Dataset[Event], gapSeconds: Long,
                 watermark: String = "10 minutes"): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val le = Encoders.scalaLong
    implicit val ose = Encoders.product[OpenSession]

    def close(userId: Long, s: OpenSession): Session =
      Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)

    def fn(userId: Long, events: Iterator[Event],
           state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(userId, _)).toIterator
        state.remove()
        return out
      }
      val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.value))
      var open = state.getOption
      val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        val gapMs = gapSeconds * 1000L
        open match {
          // within gap of the open session's INTERVAL (late-but-close
          // events extend the start backwards, they don't get mis-counted
          // inside a session whose range excludes them)
          case Some(s) if t >= s.start - gapMs && t <= s.last + gapMs =>
            open = Some(s.copy(start = math.min(s.start, t),
              last = math.max(s.last, t), n = s.n + 1, total = s.total + e.value))
          case Some(s) if t > s.last + gapMs => // future: close, start new
            closed += close(userId, s)
            open = Some(OpenSession(t, t, 1L, e.value))
          case Some(s) => // late beyond gap: its session already passed —
            // emit it as its own immediate session, keep the open one
            closed += Session(userId, new Timestamp(t), new Timestamp(t), 1L, e.value)
          case None =>
            open = Some(OpenSession(t, t, 1L, e.value))
        }
      }
      open match {
        case Some(s) =>
          state.update(s)
          state.setTimeoutTimestamp(s.last + gapSeconds * 1000L)
        case None => // no events, nothing to keep
      }
      closed.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
