package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.DedupIndex

/** Streaming ingest against a persisted [[graft.operators.DedupIndex]] —
  * the continuous face of the daily `checkBatch` loop: every micro-batch
  * is checked against the stored corpus artifacts (exact fingerprints +
  * best n-gram Jaccard, batch sides broadcast so the corpus tables are
  * scanned in place), surviving docs flow to the caller's sink, and with
  * `appendKept = true` they are folded into the index so LATER batches
  * dedupe against earlier ones — the ingest loop a 100 TB corpus runs
  * forever.
  *
  * This is `foreachBatch` composition, not new state machinery: the
  * index IS the state, on disk, shared with the batch pipeline — a batch
  * backfill and the live stream dedupe against the same artifacts with
  * the same cores ([[DedupIndex]] scaladoc). Within one micro-batch,
  * docs are checked against the index only, not each other (exactly the
  * batch `checkBatch` contract; run `StreamDedup.dedupByFingerprint`
  * upstream for intra-stream exact dups inside the watermark horizon).
  *
  * Delivery contract (standard foreachBatch): the sink callback may see
  * a replayed epoch after a failure — the SINK must tolerate replays,
  * like every non-transactional foreachBatch sink. The APPEND path,
  * however, is guarded here: each applied epoch id is recorded in the
  * index's `applied_epochs` sidecar, and a replayed epoch at or below
  * the high-water mark skips the append — a double-appended batch is NOT
  * harmless (duplicated shingle rows overcount later intersections,
  * j = 2·inter / (na + nb − 2·inter) > j_true). One crash window
  * remains: failing BETWEEN the append and its epoch record replays as
  * a double append (append-then-record, because the reverse order would
  * silently LOSE the batch) — `DedupIndex.compact` restores exactly the
  * single-append state, so the remediation is one maintenance pass, not
  * a rebuild. */
object StreamIndexDedup {

  /** Wire a streaming `docs` frame into a `foreachBatch` writer that
    * checks each epoch against the index at `path` and hands the KEPT
    * rows (original columns, plus `best_jaccard` for observability) to
    * `sink`. Call `.start()` (or add trigger/checkpoint options) on the
    * returned writer. */
  def writer(docs: DataFrame, idCol: String, textCol: String, path: String,
             minJaccard: Double, appendKept: Boolean = false)
            (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], epoch: Long) =>
      processEpoch(batch.toDF(), epoch, idCol, textCol, path, minJaccard,
        appendKept)(sink)
    }

  /** One epoch of the foreachBatch loop — factored out so the replay
    * guard is testable against the exact code the stream runs (the spec
    * re-delivers an epoch and asserts the index is byte-identical to a
    * single apply). */
  private[graft] def processEpoch(batch: DataFrame, epoch: Long,
                                  idCol: String, textCol: String,
                                  path: String, minJaccard: Double,
                                  appendKept: Boolean)
                                 (sink: (DataFrame, Long) => Unit): Unit = {
    val spark = batch.sparkSession
    val verdicts = DedupIndex.checkBatch(batch, idCol, textCol, path,
      minJaccard)
    val kept = batch.join(
        verdicts.where(col("keep")).select(col("id").as(idCol),
          col("best_jaccard")),
        Seq(idCol))
      // the verdict side is one row per batch id; persist so the
      // check plan runs once across sink + append consumers
      .persist()
    try {
      sink(kept, epoch)
      // idempotent per epoch: a foreachBatch replay re-delivers an
      // epoch id already folded in — skip it (scaladoc: why the append
      // comes before its record)
      if (appendKept &&
          !DedupIndex.lastAppliedEpoch(spark, path).exists(_ >= epoch)) {
        DedupIndex.append(kept, idCol, textCol, path)
        DedupIndex.recordAppliedEpoch(spark, path, epoch)
      }
    } finally { kept.unpersist(); () }
  }
}
