package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextStats

/** Streaming exact deduplication — the streaming face of the batch
  * `Dedup.exactGroups` / q_d1 semantics: a document whose normalized-text
  * fingerprint (TextStats.fingerprint — md5 over the alnum-collapsed,
  * lowercased text) was already seen within the watermark horizon is
  * dropped; the first arrival survives.
  *
  * Scale shape: `dropDuplicatesWithinWatermark` keys state by the 32-char
  * fingerprint only, and the watermark EVICTS state — unbounded streams
  * keep bounded per-key state, unlike a plain `dropDuplicates` whose state
  * grows forever. Keying on the fingerprint (not the full text) keeps the
  * state store rows tiny.
  */
object StreamDedup {

  /** Append a `fp` fingerprint column and drop in-horizon duplicates.
    * `tsCol` must be the event-time column the watermark rides on. */
  def dedupByFingerprint(df: DataFrame, textCol: String, tsCol: String,
                         watermark: String): DataFrame =
    df.withColumn("fp", TextStats.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
}
