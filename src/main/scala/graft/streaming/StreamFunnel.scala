package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Funnel.userSteps`: live per-user funnel
  * progression — each emitted row is a step COMPLETION (user, step,
  * event_type, t), identical to the batch operator's row set over the
  * same data (asserted stream-vs-batch in the spec).
  *
  * Exactness under out-of-order arrival, the `StreamAnomaly`/`StreamAsOf`
  * discipline: step k's completion is the earliest type-k event STRICTLY
  * after step k−1's completion, so an event may only be considered once
  * the event-time watermark has passed it strictly (no earlier event can
  * arrive any more). Until then it buffers in state. Matured events fold
  * through the step frontier in (ts, event_id) order: an event whose
  * type is the NEXT incomplete step and whose ts is strictly after the
  * previous completion advances the frontier and emits; every other
  * event is discarded on the spot — exactly the batch min-after-previous
  * semantics, replayed sequentially.
  *
  * State per key is bounded and SHRINKS as the funnel advances: the
  * completed-step times (≤ |steps| longs, the frontier) plus the
  * watermark-lag pending buffer; a user who finishes the funnel keeps
  * |steps| longs and discards everything else for ever. Event-time
  * timeouts flush pending rows when no new events arrive for the key. */
object StreamFunnel {

  case class In(user: Long, ts: Timestamp, event_id: Long, event_type: String)
  case class StepDone(user: Long, step: Long, event_type: String, t: Timestamp)
  /** done: completion times (ms) of steps 0..done.size−1;
    * pending: (tsMs, event_id, type) not yet past the watermark. */
  case class St(done: Seq[Long], pending: Seq[(Long, Long, String)])

  def track(in: Dataset[In], steps: Seq[String],
            watermark: String = "10 minutes",
            maxGapsMs: Seq[Option[Long]] = Nil): Dataset[StepDone] = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps: $steps")
    require(steps.distinct == steps, s"funnel steps must be distinct: $steps")
    require(maxGapsMs.isEmpty || maxGapsMs.size == steps.size - 1,
      s"maxGapsMs needs one entry per transition: $maxGapsMs")
    val gaps: IndexedSeq[Option[Long]] =
      (if (maxGapsMs.isEmpty) Seq.fill(steps.size - 1)(None)
       else maxGapsMs).toIndexedSeq
    implicit val oe: org.apache.spark.sql.Encoder[StepDone] =
      Encoders.product[StepDone]
    implicit val ke: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val se: org.apache.spark.sql.Encoder[St] = Encoders.product[St]

    def advance(user: Long, st: St, wm: Long): (Seq[StepDone], St) = {
      val (ripe, wait) = st.pending.partition(_._1 < wm)
      var done = st.done
      val out = scala.collection.mutable.ArrayBuffer.empty[StepDone]
      ripe.sortBy(r => (r._1, r._2)).foreach { case (t, _, tpe) =>
        val k = done.size
        // the per-transition window mirrors the batch (t, t+gap] range:
        // an out-of-window event is discarded like a wrong-type one —
        // the frontier waits for an IN-window event or stays forever
        if (k < steps.size && tpe == steps(k) &&
            (k == 0 || (t > done(k - 1) &&
              gaps(k - 1).forall(g => t <= done(k - 1) + g)))) {
          done = done :+ t
          out += StepDone(user, k.toLong, tpe, new Timestamp(t))
        }
      }
      (out.toSeq, St(done, wait))
    }

    def fn(user: Long, rows: Iterator[In],
           state: GroupState[St]): Iterator[StepDone] = {
      val st0 = state.getOption.getOrElse(St(Nil, Nil))
      val st1 =
        if (state.hasTimedOut) st0
        else St(st0.done, st0.pending ++
          // a finished funnel needs no more input: drop on arrival
          (if (st0.done.size == steps.size) Nil
           else rows.map(r => (r.ts.getTime, r.event_id, r.event_type))))
      val wm0 = state.getCurrentWatermarkMs()
      val wm = if (wm0 <= 0L) Long.MinValue else wm0
      val (out, st2) = advance(user, st1, wm)
      state.update(st2)
      if (st2.pending.nonEmpty)
        state.setTimeoutTimestamp(
          math.max(st2.pending.map(_._1).min, wm0) + 1)
      out.iterator
    }

    in.withWatermark("ts", watermark)
      .groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn _)
  }
}
