package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Bloom
import graft.operators.Dedup

/** Streaming-safe benchmark-contamination flagging — the ingest-time
  * face of the batch q_t7 contamination join: mark every incoming
  * document that shares an n-word shingle with a benchmark/eval corpus,
  * BEFORE it lands in the training set.
  *
  * Instead of a stream-side join (per-micro-batch shuffle against the
  * benchmark table), the benchmark's shingles are compiled ONCE into a
  * Bloom filter ([[Bloom.build]], one aggregate pass over the eval
  * corpus — eval sets are small) and the stream check is a STATELESS
  * map-side expression: `exists(shingles, bit-probe)`. No watermark, no
  * state store, no shuffle — works identically on a batch DataFrame and
  * a streaming one, at scan speed. The Bloom can only err by
  * OVER-flagging (a false positive quarantines a clean doc for the
  * exact batch check); a contaminated document is never missed — the
  * no-false-negatives direction is the one eval hygiene needs.
  */
object StreamContamination {

  /** Compile the benchmark corpus into the shingle Bloom filter. No
    * distinct pass: Bloom bit-OR insertion is idempotent, so deduping
    * keys first would only add a shuffle. */
  def benchmarkFilter(benchmark: DataFrame, textCol: String, n: Int = 3,
                      numBits: Int = 1 << 20, numHashes: Int = 5): Bloom.Filter = {
    val sh = Dedup.withWords(benchmark, textCol)
      .select(explode(Dedup.shinglesFromWords(col("_ws"), n)).as("s"))
    Bloom.build(sh, "s", numBits, numHashes)
  }

  /** Add a `contaminated` flag: true iff ANY of the document's n-word
    * shingles might be in the benchmark filter. Stateless and map-side —
    * safe under structured streaming with no watermark. */
  def flag(df: DataFrame, textCol: String, filter: Bloom.Filter,
           n: Int = 3): DataFrame = {
    require(!df.columns.contains("contaminated"),
      "input column 'contaminated' collides with the output flag — alias it")
    Dedup.withWords(df, textCol) // tokenize once per doc, not per shingle
      .withColumn("contaminated",
        exists(Dedup.shinglesFromWords(col("_ws"), n),
          s => Bloom.mightContain(s, filter)))
      .drop("_ws")
  }
}
