package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Anomaly.rollingZScore`: per-key trailing-window
  * z-scores over a live event stream — the monitoring lane of the same
  * detector the batch pass runs over history.
  *
  * Exactness under out-of-order arrival, the `StreamAsOf` discipline: an
  * event's z depends on the `lookback` events PRECEDING it in (ts, id)
  * order, so an event is scored only once the event-time watermark has
  * passed it strictly — no earlier event can arrive any more. Until
  * then it buffers in state. Matured events fold through the trailing
  * window in (ts, id) order, so emitted rows are IDENTICAL to the batch
  * operator over the same data (asserted stream-vs-batch in the spec),
  * arithmetic included: the window sums accumulate on the same
  * DECIMAL(12,2)/(25,4) grids (exact, order-free) and the float
  * mean/variance/z formula is the batch one, op for op.
  *
  * State per key is bounded: the `lookback`-deep history of scored
  * events plus the pending buffer the watermark lag allows; both live in
  * the state store hash-partitioned by key (no driver state). Event-time
  * timeouts drain quiet keys; state is removed once a key is fully
  * drained and its history can no longer matter (never here — history
  * must persist for future events, so quiet keys hold `lookback` rows:
  * the honest floor for a detector that must remember its baseline). */
object StreamAnomaly {

  case class In(key: Long, ts: Timestamp, event_id: Long, value: Double)
  case class Scored(key: Long, event_id: Long, ts: Timestamp, value: Double,
                    n_prev: Long, mean_prev: Option[Double],
                    z: Option[Double], anomaly: Boolean)
  /** history: (tsMs, id, value) of the last `lookback` SCORED events,
    * (ts, id) ascending; pending: not-yet-mature arrivals. */
  case class St(history: Seq[(Long, Long, Double)],
                pending: Seq[(Long, Long, Double)])

  /** The batch operator's arithmetic, replayed per event: exact decimal
    * sums of the history values (2-dp grid) and their squares, then the
    * shared double formula. Returns (n, mean, z, anomaly). */
  private def score(history: Seq[(Long, Long, Double)], v: Double,
                    minPoints: Int, zThreshold: Double)
      : (Long, Option[Double], Option[Double], Boolean) = {
    val n = history.size.toLong
    if (n == 0) (0L, None, None, false)
    else {
      // valueOf (shortest decimal repr) then setScale HALF_UP — the same
      // path Spark's double→DECIMAL(12,2) cast takes, so the grid values
      // are identical by construction, not just on-grid coincidence
      val dec = history.map { case (_, _, x) =>
        java.math.BigDecimal.valueOf(x).setScale(2, java.math.RoundingMode.HALF_UP)
      }
      val sv = dec.reduce(_ add _).doubleValue
      val sq = dec.map(d => d.multiply(d)).reduce(_ add _).doubleValue
      val mean = sv / n
      val varr = math.max(sq / n - (sv / n) * (sv / n), 0.0)
      val z = if (n >= minPoints && varr > 0)
        Some((v - mean) / math.sqrt(varr)) else None
      (n, Some(mean), z, z.exists(x => math.abs(x) > zThreshold))
    }
  }

  def detect(in: Dataset[In], lookback: Int = 20, minPoints: Int = 5,
             zThreshold: Double = 3.0,
             watermark: String = "10 minutes"): Dataset[Scored] = {
    require(lookback >= 1 && minPoints >= 2 && zThreshold > 0,
      s"bad config: lookback=$lookback minPoints=$minPoints z=$zThreshold")
    implicit val oe: org.apache.spark.sql.Encoder[Scored] = Encoders.product[Scored]
    implicit val ke: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val se: org.apache.spark.sql.Encoder[St] = Encoders.product[St]

    def advance(key: Long, st: St, wm: Long): (Seq[Scored], St) = {
      val (ripe, wait) = st.pending.partition(_._1 < wm)
      var hist = st.history
      val out = ripe.sorted.map { case (t, id, v) =>
        val (n, mean, z, flag) = score(hist, v, minPoints, zThreshold)
        hist = (hist :+ ((t, id, v))).takeRight(lookback)
        Scored(key, id, new Timestamp(t), v, n,
          mean.map(m => BigDecimal(m).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble),
          z.map(x => BigDecimal(x).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble), flag)
      }
      (out, St(hist, wait))
    }

    def fn(key: Long, rows: Iterator[In],
           state: GroupState[St]): Iterator[Scored] = {
      val st0 = state.getOption.getOrElse(St(Nil, Nil))
      val st1 =
        if (state.hasTimedOut) st0
        else St(st0.history, st0.pending ++
          rows.map(r => (r.ts.getTime, r.event_id, r.value)))
      val wm0 = state.getCurrentWatermarkMs()
      val wm = if (wm0 <= 0L) Long.MinValue else wm0
      val (out, st2) = advance(key, st1, wm)
      // history must outlive quiet periods (it is the key's baseline),
      // so state persists; timeouts only exist to flush pending rows
      state.update(st2)
      if (st2.pending.nonEmpty)
        state.setTimeoutTimestamp(
          math.max(st2.pending.map(_._1).min, wm0) + 1)
      out.iterator
    }

    in.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn _)
  }
}
