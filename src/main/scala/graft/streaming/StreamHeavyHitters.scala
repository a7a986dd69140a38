package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CountMin

/** Streaming heavy hitters — the streaming face of the batch
  * `TextStats.heavyShingles` / Count-Min pair: one fixed-size Count-Min
  * sketch per event-time window, maintained incrementally as batches
  * arrive.
  *
  * Scale shape: the streaming state is depth×width longs PER WINDOW,
  * full stop — an exact streaming `groupBy(key).count` keeps one state
  * row per distinct key and grows without bound on an open vocabulary
  * (urls, shingles, user ids), which is precisely the regime heavy-
  * hitter monitoring targets. Sketch merge is element-wise addition, so
  * partial aggregation combines map-side within every micro-batch and
  * the update against the state store is one fixed-size row. Estimates
  * keep the classic Count-Min guarantee (never an undercount); read
  * them from the emitted sketch with `CountMin.estimate`.
  */
object StreamHeavyHitters {

  /** Windowed sketch of `keyCol` occurrences: emits
    * (window_start, window_end, sketch) rows, refined every micro-batch
    * in update mode; the watermark closes and evicts windows. */
  def windowedSketch(df: DataFrame, keyCol: String, tsCol: String,
                     windowDur: String, watermark: String,
                     depth: Int = 4, width: Int = 1024): DataFrame =
    df.withColumn("_h", xxhash64(col(keyCol)))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(CountMin.sketch(depth, width)(col("_h")).as("sketch"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("sketch"))
}
