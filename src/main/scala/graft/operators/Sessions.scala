package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-time sessionization — the batch twin of
  * `streaming/Sessionize` (flatMapGroupsWithState): events of a key
  * belong to one session while the gap to the previous event is
  * ≤ `gapSeconds`; a longer gap starts a new session. On mature data the
  * two agree (SessionsSpec pins the equivalence), which is what lets a
  * pipeline backfill history in batch and continue the same sessions
  * definition on the live stream.
  *
  * Scale shape: ONE hash exchange on the key. `withSessionId` is the
  * classic lag → boundary-flag → running-count composition over a single
  * keyed sort; the session aggregate that follows groups on
  * (key, session_idx), and HashPartitioning(key) already satisfies
  * ClusteredDistribution(key, session_idx) — rows of one session can
  * never sit in two partitions — so Catalyst plans the final aggregate
  * WITHOUT a second exchange (plan-asserted in SessionsSpec). Per-key
  * data volume is the only skew dimension, the same one any per-user
  * window carries.
  */
object Sessions {

  /** Epoch microseconds for any timestamp flavor: `unix_micros` accepts
    * only TIMESTAMP (LTZ), so NTZ columns (naive parquet `timestamp[us]`,
    * e.g. the driver testdata's `events.ts`) are cast first — a no-op for
    * LTZ inputs, and under the project-wide UTC session timezone the NTZ
    * wall-clock reinterpretation matches the DuckDB oracle's
    * `epoch_us(ts)` on the same naive values. */
  def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Tag every event with a 0-based `session_idx` per key. `tieBreak`
    * columns order equal timestamps deterministically (pass the event's
    * unique id; engines disagree on unstable sort ties otherwise). */
  def withSessionId(events: DataFrame, keyCols: Seq[String], tsCol: String,
                    gapSeconds: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "sessionize needs >= 1 key column")
    require(gapSeconds > 0, s"gapSeconds must be positive: $gapSeconds")
    val order = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    // microsecond-exact gap test (unix_timestamp would truncate to
    // seconds and disagree with an interval-comparison oracle)
    val isBreak = when(prev.isNull, lit(0L))
      .otherwise((epochUs(col(tsCol)) - epochUs(prev) >
        gapSeconds * 1000000L).cast("long"))
    events.withColumn("session_idx",
      sum(isBreak).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Aggregate events into one row per session: key columns,
    * `session_idx`, `session_start`, `session_end`, `n_events`, plus any
    * caller aggregates (e.g. a value sum). */
  def sessionize(events: DataFrame, keyCols: Seq[String], tsCol: String,
                 gapSeconds: Long, tieBreak: Seq[String] = Nil,
                 extraAggs: Seq[Column] = Nil): DataFrame = {
    val tagged = withSessionId(events, keyCols, tsCol, gapSeconds, tieBreak)
    val aggs = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events")) ++ extraAggs
    tagged.groupBy((keyCols :+ "session_idx").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
