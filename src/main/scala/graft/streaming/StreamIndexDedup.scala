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
  * a replayed epoch after a failure. With `appendKept = true` the caller
  * must make the append path idempotent (e.g. skip epochs at or below
  * the last checkpointed batchId) — a double-appended batch is NOT
  * harmless here, because duplicated shingle rows overcount later
  * intersections (j = 2·inter / (na + nb − 2·inter) > j_true). This is
  * the same at-least-once caveat every non-transactional foreachBatch
  * sink carries; stated loudly instead of hidden. */
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
        if (appendKept) DedupIndex.append(kept, idCol, textCol, path)
      } finally { kept.unpersist(); () }
    }
}
