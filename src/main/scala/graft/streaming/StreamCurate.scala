package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextStats

/** Streaming curation front door — the STATELESS prefix of the batch
  * curation chain (`api.Pipeline.curateStrict` stages 2–3 plus the token
  * cost), composed for a `readStream` ingest:
  *
  *   Gopher gate on RAW text → PII scrub → token cost
  *
  * Every stage is a map-side expression ([[TextStats.gopherKeep]] is the
  * flags frame's rule set as ONE boolean column — no metrics join, which
  * a stream could not do statelessly anyway), so the composition runs
  * identically on streaming and batch frames: no state store, no
  * watermark, and per-row verdicts that are deterministic under replay
  * (an at-least-once upstream re-delivering a row re-derives the same
  * verdict — idempotent by purity, not by bookkeeping).
  *
  * Stage order is load-bearing, same as the batch chain: the gate reads
  * RAW text because its symbol/bullet/ellipsis metrics vanish after
  * scrubbing, and the scrub pays only for gate survivors.
  *
  * What is deliberately NOT here: corpus-wide stages. Dedup needs state —
  * compose downstream with [[StreamDedup]] (within-watermark exact dedup)
  * or [[StreamIndexDedup]] (vs a persisted corpus index); splitting and
  * shard packing belong to the batch compactor that drains the sink
  * (packing is a keyed window over a FINISHED set, not a stream).
  */
object StreamCurate {

  /** Gate + scrub + cost. Output: the input row with `textCol` scrubbed
    * and `n_tokens` (BPE-ish token count of the scrubbed text) appended;
    * rows failing the Gopher gate are dropped. Works unchanged on batch
    * frames — StreamingSpec asserts stream output == the batch run row
    * for row. */
  def curateStateless(df: DataFrame, textCol: String,
                      gopher: TextStats.GopherParams =
                        TextStats.GopherParams()): DataFrame = {
    require(!df.columns.contains("n_tokens"),
      "input column n_tokens collides with the curation output — alias it")
    df.where(TextStats.gopherKeep(col(textCol), gopher))
      .withColumn(textCol, TextStats.scrubPii(col(textCol)))
      .withColumn("n_tokens", TextStats.tokenCount(col(textCol)))
  }
}
