package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.IvfPqIndex

/** Streaming ANN retrieval from a persisted [[graft.operators.IvfPqIndex]]
  * — the SERVING face of the index lifecycle (build/append/delete/compact
  * are the write lane; this is the read lane run continuously): every
  * micro-batch of query vectors is answered from the on-disk index — the
  * probe manifest prunes the codes scan to the probed partition
  * directories, ADC scores the surviving rows, `rerankDepth` candidates
  * re-rank exactly — and the per-epoch top-k flows to the caller's sink.
  *
  * `foreachBatch` composition, not new state machinery, for the same
  * reason as [[StreamIndexDedup]]: the index IS the state, on disk,
  * shared with batch callers — a batch analytics job and the live query
  * stream serve from the same artifacts, and an `append`/`delete` landing
  * between epochs is picked up by the next epoch's search with no restart
  * (each search re-reads the sidecars; tombstoned rows drop before
  * scoring).
  *
  * Delivery contract: search is a PURE READ, so a replayed epoch re-serves
  * byte-identical results — idempotent by purity, with no high-water-mark
  * guard needed (contrast the append path in [[StreamIndexDedup]], where
  * replay is a correctness hazard). The sink sees standard foreachBatch
  * at-least-once semantics. */
object StreamAnnServe {

  /** Wire a streaming frame of query vectors (`idCol`, `vecCol`) into a
    * `foreachBatch` writer that searches the index at `path` and hands
    * each epoch's (query_id, neighbor_id, cosine, rank) rows to `sink`.
    * `rerank` supplies the raw-vector table for exact re-ranking, exactly
    * as in batch [[IvfPqIndex.search]]. Call `.start()` (or add
    * trigger/checkpoint options) on the returned writer. */
  def writer(queries: DataFrame, idCol: String, vecCol: String, path: String,
             k: Int, nProbe: Int, rerankDepth: Int = 50,
             rerank: Option[DataFrame] = None)
            (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    queries.writeStream.foreachBatch { (batch: Dataset[Row], epoch: Long) =>
      sink(IvfPqIndex.search(batch.sparkSession, path, batch.toDF(), idCol,
        vecCol, k, nProbe, rerankDepth, rerank), epoch)
    }
}
