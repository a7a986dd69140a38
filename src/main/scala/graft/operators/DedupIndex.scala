package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted incremental-dedup index — the build-once / check-many shape
  * of `Dedup.dedupAgainstCorpus` (the batch-vs-corpus check a daily
  * ingest pipeline runs; reference shape: the incremental-arrival test
  * behind q_d7). That operator re-tokenizes and re-hashes the CORPUS on
  * every call; at 100 TB the corpus-side artifacts must be computed once
  * at build time and only scanned afterwards. This object persists
  * exactly what the check needs:
  *
  *   path/shingles/  (id, h) distinct shingle hashes per corpus doc —
  *                   the inverted-index side of the candidate join
  *   path/counts/    (id, n_sh) distinct-shingle count per corpus doc
  *                   (the |B| term of Jaccard — stored so the check
  *                   never re-aggregates the corpus-sized shingle table)
  *   path/fps/       distinct normalized-text fingerprints (exact dedup)
  *   path/meta/      one row: shingle width `n` + `portable` hash flag
  *                   (appends/checks MUST hash identically to the build,
  *                   so both are frozen here, never re-passed)
  *
  * Check-time scale shape (`broadcastBatch = true`, the default): the
  * daily batch is small next to the corpus, so its shingle rows and
  * fingerprints ride BROADCAST sides of the two joins — the stored
  * corpus tables are scanned in place, never shuffled, and the only
  * exchanges carry matching-pair rows. With `broadcastBatch = false`
  * (batch too big for one executor's memory) both joins fall back to
  * plain shuffles.
  *
  * Raw text is deliberately NOT duplicated into the index: the check
  * needs only hashes and counts, so the index stays a small fraction of
  * corpus bytes (~8 B per distinct shingle).
  *
  * Determinism: build/append/check all tokenize through
  * `Dedup.shingleHashRows` and score through `Dedup.bestJaccardAgainst` /
  * `assembleCheck` — the same `private[operators]` cores the in-memory
  * operator uses — so `checkBatch` over a built index returns EXACTLY
  * what `dedupAgainstCorpus` returns for the same inputs (asserted in
  * DedupIndexSpec; q_d10 serves q_d7's oracle verbatim). */
object DedupIndex {

  /** Tokenize + hash + fingerprint the corpus once and write all three
    * artifacts under `path` — shared verbatim by `build` (overwrite) and
    * `append` (append), so the incremental path cannot drift. */
  private def writeParts(docs: DataFrame, idCol: String, textCol: String,
                         path: String, n: Int, portable: Boolean,
                         mode: String): Unit = {
    val rows = Dedup.shingleHashRows(docs, idCol, textCol, n, portable)
    // two consumers (row write + count aggregate): persist so the
    // tokenize/window stage runs once — write-side only, released here
    rows.persist()
    try {
      rows.write.mode(mode).parquet(s"$path/shingles")
      rows.groupBy("id").agg(count(lit(1)).as("n_sh"))
        .write.mode(mode).parquet(s"$path/counts")
    } finally { rows.unpersist(); () }
    docs.select(TextStats.fingerprint(col(textCol)).as("fp")).distinct()
      .write.mode(mode).parquet(s"$path/fps")
  }

  /** Build the index under `path`: one tokenize pass over the corpus,
    * three artifact writes, one meta sidecar. */
  def build(corpus: DataFrame, idCol: String, textCol: String, path: String,
            n: Int = 3, portable: Boolean = true): Unit = {
    require(n > 0, s"shingle width must be positive: $n")
    val spark = corpus.sparkSession
    writeParts(corpus, idCol, textCol, path, n, portable, "overwrite")
    import spark.implicits._
    Seq((n, portable)).toDF("n", "portable")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  private def readMeta(spark: SparkSession, path: String): (Int, Boolean) = {
    val m = spark.read.parquet(s"$path/meta").head()
    (m.getAs[Int]("n"), m.getAs[Boolean]("portable"))
  }

  /** Fold a new batch into the index — tokenized with the STORED shingle
    * width and hash flavor (never re-passed: a mismatched width would
    * silently zero every future cross-batch intersection). Caller owns
    * id uniqueness across batches, exactly like any append-only table;
    * appended fingerprints may duplicate stored ones (the check collapses
    * hits per batch id, so duplicates cost bytes, not correctness).
    * `build(a); append(b)` ≡ `build(a ∪ b)` row-identically — there is
    * no trained state here, only accrued rows (asserted in
    * DedupIndexSpec). */
  def append(batch: DataFrame, idCol: String, textCol: String,
             path: String): Unit = {
    val (n, portable) = readMeta(batch.sparkSession, path)
    writeParts(batch, idCol, textCol, path, n, portable, "append")
  }

  /** Rewrite the three artifact tables compactly — the maintenance pass
    * a long-lived index needs after many appends (each append adds a
    * task's worth of files per artifact; compaction folds them back to
    * ~one file per shuffle partition). The fps table additionally
    * collapses to DISTINCT fingerprints (appends may re-add stored fps;
    * duplicates are harmless to `checkBatch` — it dedups hit ids — but
    * cost bytes forever). Results are unaffected: same rows, same
    * verdicts (asserted byte-identical in DedupIndexSpec).
    *
    * Crash-safety mirrors `IvfPqIndex.compact`: each table stages into a
    * sibling directory and swaps by rename, so an interrupted compact
    * leaves the original artifacts intact. Not safe against a CONCURRENT
    * reader across the swap instant — run in the index's write lane,
    * like the appends themselves. */
  def compact(spark: SparkSession, path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
      f.delete(); ()
    }
    def swapIn(part: String, df: DataFrame): Unit = {
      val staged = s"$path/${part}_compacting"
      df.write.mode("overwrite").parquet(staged)
      val live = new java.io.File(path, part)
      val old = new java.io.File(path, s"${part}_old")
      rm(old)
      require(live.renameTo(old) &&
        new java.io.File(staged).renameTo(live),
        s"compact swap failed for $part under $path — original left at " +
          s"${old.getAbsolutePath}")
      rm(old)
    }
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    swapIn("shingles", spark.read.parquet(s"$path/shingles").repartition(n))
    swapIn("counts", spark.read.parquet(s"$path/counts").repartition(n))
    swapIn("fps", spark.read.parquet(s"$path/fps").distinct())
  }

  /** Check a batch against the indexed corpus. Output per batch doc
    * (same frame as `Dedup.dedupAgainstCorpus`): `id`,
    * `dropped_exact` (normalized-text fingerprint already in corpus),
    * `best_jaccard` (max exact n-gram Jaccard against any corpus doc
    * sharing ≥ 1 shingle, null when none), and the composite `keep`. */
  def checkBatch(batch: DataFrame, idCol: String, textCol: String,
                 path: String, minJaccard: Double,
                 broadcastBatch: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    val (n, portable) = readMeta(spark, path)
    val bRows = Dedup.shingleHashRows(batch, idCol, textCol, n, portable)
    val cRows = spark.read.parquet(s"$path/shingles")
    val nb = spark.read.parquet(s"$path/counts")
      .select(col("id").as("cid"), col("n_sh").as("nb"))
    val bfp = batch.select(col(idCol).as("id"),
      TextStats.fingerprint(col(textCol)).as("fp"))
    // stored-fps ⋈ broadcast(batch fps), collapsed to distinct hit ids:
    // scans the (possibly duplicated-by-append) fp table in place and
    // cannot multiply batch rows
    val bfpSide = if (broadcastBatch) broadcast(bfp) else bfp
    val exactHits = spark.read.parquet(s"$path/fps").join(bfpSide, Seq("fp"))
      .select("id").distinct().withColumn("_hit", lit(1))
    Dedup.assembleCheck(bfp.select("id"), exactHits,
      Dedup.bestJaccardAgainst(bRows, cRows, nb, broadcastBatch), minJaccard)
  }
}
