package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.{IndexFiles, Metrics}

/** Streaming model-quality monitor — the live twin of the batch
  * grade lane ([[graft.operators.Metrics]]): a stream of scored
  * examples (score, label) accumulates into a persisted
  * (score, n_pos, n_neg) HISTOGRAM, and every epoch the caller gets the
  * cumulative AUC + ECE/MCE graded from it. "Is the model drifting in
  * production" answered continuously, with the same arithmetic — and
  * therefore the same numbers — as the batch metrics over the same
  * examples (asserted stream==batch in the spec).
  *
  * Why a histogram store and not stream-native state: every metric in
  * `Metrics` folds from the score histogram, and histogram counts are
  * MERGEABLE (the HLL-registers discipline — the artifact is the
  * aggregate state). So per-epoch cost is one map-side-combinable
  * aggregate over the batch plus an append of ≤ |score grid| rows; the
  * grade is a read-side fold over the merged store, bounded by the
  * grid (≤ 1e6+1 rows for 6-dp scores) regardless of how many examples
  * ever streamed. The store is shared with batch callers —
  * [[grade]] works on any session, no stream running.
  *
  * Delivery contract: appends are guarded by the `applied_epochs`
  * high-water mark (the [[StreamIndexDedup]] replay discipline, same
  * sidecar layout), so a replayed epoch never double-counts; the grade
  * itself is a pure read. */
object StreamMetrics {

  /** Cumulative grade from the persisted histogram at `path`: ONE row
    * (n_pos, n_neg, auc, n, ece, mce) — the q_e5 grade shape. */
  def grade(spark: SparkSession, path: String, bins: Int = 10): DataFrame = {
    val hist = Metrics.mergeHistograms(
      spark.read.parquet(s"$path/hist")
        .select(col("score"), col("n_pos"), col("n_neg")))
    Metrics.aucFromHistogram(hist)
      .crossJoin(broadcast(Metrics.eceFromHistogram(hist, bins)))
  }

  /** One epoch of the monitor, callable directly (the
    * [[StreamIndexDedup.processEpoch]] convention): merge the batch's
    * histogram into the store unless this epoch already applied, then
    * return the cumulative grade. */
  def processEpoch(batch: DataFrame, epoch: Long, scoreCol: Column,
                   labelCol: Column, path: String,
                   bins: Int = 10): DataFrame = {
    val spark = batch.sparkSession
    val applied = IndexFiles.readIfExists(spark, s"$path/applied_epochs")
      .flatMap(df => Option(df.agg(max("epoch")).head().get(0))
        .map(_.asInstanceOf[Long]))
    if (!applied.exists(_ >= epoch)) {
      Metrics.scoreHistogram(batch, scoreCol, labelCol)
        .write.mode("append").parquet(s"$path/hist")
      import spark.implicits._
      Seq(epoch).toDF("epoch").write.mode("append")
        .parquet(s"$path/applied_epochs")
    }
    grade(spark, path, bins)
  }

  /** Wire a streaming frame of scored examples into a `foreachBatch`
    * writer that accumulates the histogram at `path` and hands each
    * epoch's cumulative grade row to `sink`. Call `.start()` (or add
    * trigger/checkpoint options) on the returned writer. */
  def writer(scored: DataFrame, scoreCol: Column, labelCol: Column,
             path: String, bins: Int = 10)
            (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    scored.writeStream.foreachBatch { (batch: Dataset[Row], epoch: Long) =>
      sink(processEpoch(batch.toDF(), epoch, scoreCol, labelCol, path, bins),
        epoch)
    }
}
