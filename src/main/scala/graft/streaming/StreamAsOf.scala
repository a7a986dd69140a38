package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward as-of enrichment (Flink's "temporal join" shape):
  * a stream of EVENTS is enriched with the latest MARK at or before each
  * event's timestamp, per key — calibration marks vs readings, quotes vs
  * trades — from ONE union-tagged input stream.
  *
  * Correctness under out-of-order arrival: an event is emitted only once
  * the event-time watermark has passed it (strictly), because only then
  * can no further mark with `mark.ts <= event.ts` arrive; until that
  * point the event is buffered in state. Emitted matches are therefore
  * IDENTICAL to the batch `AsOf.asofJoinBackward` over the same data
  * (asserted batch-vs-stream in the spec) — the watermark delay is the
  * price of exactness, the same trade `dropDuplicatesWithinWatermark`
  * makes.
  *
  * State is bounded on both sides: pending events are capped by the
  * watermark lag (they drain as the watermark advances, via event-time
  * timeouts when the group goes quiet), and the mark list is pruned to
  * the single latest mark at or before the watermark plus any not-yet-
  * final marks after it. State lives in the state store hash-partitioned
  * by key — no driver state, same scale shape as any streaming
  * aggregation.
  */
object StreamAsOf {

  /** Union-tagged input: side 0 = mark (carries `m_value`), side 1 =
    * event (carries `event_id`). */
  case class In(key: String, ts: Timestamp, side: Int, event_id: Long,
                m_value: Double)
  case class Enriched(key: String, event_id: Long, ts: Timestamp,
                      m_ts: Timestamp, m_value: Option[Double])
  /** (ts millis, value) marks ascending; (ts millis, id) events pending. */
  case class St(marks: Seq[(Long, Double)], pending: Seq[(Long, Long)])

  def enrich(in: Dataset[In], watermark: String = "10 minutes"): Dataset[Enriched] = {
    implicit val ee: org.apache.spark.sql.Encoder[Enriched] = Encoders.product[Enriched]
    implicit val se: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    implicit val ste: org.apache.spark.sql.Encoder[St] = Encoders.product[St]

    def matchMark(marks: Seq[(Long, Double)], t: Long): Option[(Long, Double)] =
      marks.takeWhile(_._1 <= t).lastOption

    // emit every pending event strictly older than the watermark (no
    // mark ≤ its ts can arrive any more), prune marks to the latest one
    // at-or-before the watermark plus everything after it
    def advance(key: String, st: St, wm: Long): (Seq[Enriched], St) = {
      val (ripe, wait) = st.pending.partition(_._1 < wm)
      val out = ripe.sorted.map { case (t, id) =>
        val m = matchMark(st.marks, t)
        Enriched(key, id, new Timestamp(t),
          m.map(x => new Timestamp(x._1)).orNull, m.map(_._2))
      }
      val done = st.marks.takeWhile(_._1 < wm)
      val keptMarks =
        if (done.isEmpty) st.marks
        else st.marks.drop(done.size - 1) // latest pre-watermark mark stays
      (out, St(keptMarks, wait))
    }

    def fn(key: String, rows: Iterator[In],
           state: GroupState[St]): Iterator[Enriched] = {
      val st0 = state.getOption.getOrElse(St(Nil, Nil))
      val st1 =
        if (state.hasTimedOut) st0
        else {
          val newRows = rows.toSeq
          val marks = (st0.marks ++ newRows.filter(_.side == 0)
            .map(r => (r.ts.getTime, r.m_value))).distinct.sorted
          val pending = st0.pending ++ newRows.filter(_.side == 1)
            .map(r => (r.ts.getTime, r.event_id))
          St(marks, pending)
        }
      // getCurrentWatermarkMs() is 0 before the first watermark is
      // computed — Long.MinValue would mature pre-epoch events early, so
      // treat a non-positive watermark as "hold everything"
      val wm0 = state.getCurrentWatermarkMs()
      val wm = if (wm0 <= 0L) Long.MinValue else wm0
      val (out, st2) = advance(key, st1, wm)
      if (st2.pending.isEmpty && st2.marks.isEmpty) state.remove()
      else {
        state.update(st2)
        if (st2.pending.nonEmpty)
          // fire once the watermark passes the oldest pending event
          // (clamped above the CURRENT watermark — Spark rejects earlier)
          state.setTimeoutTimestamp(math.max(st2.pending.map(_._1).min, wm0) + 1)
      }
      out.iterator
    }

    in.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn _)
  }
}
