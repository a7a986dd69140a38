package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Bloom

/** Persisted incremental-dedup index — the build-once / check-many shape
  * of `Dedup.dedupAgainstCorpus` (the batch-vs-corpus check a daily
  * ingest pipeline runs; reference shape: the incremental-arrival test
  * behind q_d7). That operator re-tokenizes and re-hashes the CORPUS on
  * every call; at 100 TB the corpus-side artifacts must be computed once
  * at build time and only scanned afterwards. This object persists
  * exactly what the check needs:
  *
  *   path/shingles/   (id, h) distinct shingle hashes per corpus doc —
  *                    the inverted-index side of the candidate join
  *   path/counts/     (id, n_sh) distinct-shingle count per corpus doc
  *                    (the |B| term of Jaccard — stored so the check
  *                    never re-aggregates the corpus-sized shingle table)
  *   path/fps/        (id, fp) normalized-text fingerprint PER DOC (the
  *                    id makes the row deletable; the exact-dup join
  *                    reads only fp)
  *   path/bloom/      one row: Bloom filter words over every stored fp +
  *                    its hash count — the serving fast path that lets
  *                    `checkBatch` skip the exact-dup join for
  *                    wholly-novel batches
  *   path/meta/       one row: shingle width `n` + `portable` hash flag
  *                    (appends/checks MUST hash identically to the build,
  *                    so both are frozen here, never re-passed)
  *   path/tombstones/ (id) — optional; rows [[delete]]d but not yet
  *                    physically dropped. Consulted by every check,
  *                    folded in (and cleared) by [[compact]].
  *   path/applied_epochs/ (epoch) — optional; the streaming replay guard
  *                    (see [[lastAppliedEpoch]])
  *
  * Check-time scale shape (`broadcastBatch = true`, the default): the
  * daily batch is small next to the corpus, so its shingle rows and
  * fingerprints ride BROADCAST sides of the two joins — the stored
  * corpus tables are scanned in place, never shuffled, and the only
  * exchanges carry matching-pair rows. Tombstones ride broadcast
  * anti-joins for the same reason (takedown sets are small; a large
  * accumulated set is what compact is for). With
  * `broadcastBatch = false` (batch too big for one executor's memory)
  * both joins fall back to plain shuffles.
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

  /** Default Bloom sizing: 2^20 bits (128 KiB) / 5 hashes ≈ 3% false
    * positives at 1 M stored fingerprints — a false positive only costs
    * running the fps join that a bloom-less index always runs. */
  val DefaultBloomBits: Int = 1 << 20
  val DefaultBloomHashes: Int = 5

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
    docs.select(col(idCol).as("id"),
        TextStats.fingerprint(col(textCol)).as("fp"))
      .write.mode(mode).parquet(s"$path/fps")
  }

  private def writeBloom(spark: SparkSession, path: String,
                         f: Bloom.Filter): Unit = {
    import spark.implicits._
    Seq((f.words.toSeq, f.numHashes)).toDF("words", "num_hashes")
      .write.mode("overwrite").parquet(s"$path/bloom")
  }

  private def readBloom(spark: SparkSession, path: String): Option[Bloom.Filter] =
    IndexFiles.readIfExists(spark, s"$path/bloom").map { df =>
      val r = df.head()
      Bloom.Filter(r.getSeq[Long](r.fieldIndex("words")).toArray,
        r.getAs[Int]("num_hashes"))
    }

  /** Build the index under `path`: one tokenize pass over the corpus,
    * three artifact writes, the fps Bloom filter, one meta sidecar. */
  def build(corpus: DataFrame, idCol: String, textCol: String, path: String,
            n: Int = 3, portable: Boolean = true,
            bloomBits: Int = DefaultBloomBits,
            bloomHashes: Int = DefaultBloomHashes): Unit = {
    require(n > 0, s"shingle width must be positive: $n")
    val spark = corpus.sparkSession
    // a fresh build invalidates any previous index's optional sidecars
    IndexFiles.remove(spark, s"$path/tombstones")
    IndexFiles.remove(spark, s"$path/applied_epochs")
    writeParts(corpus, idCol, textCol, path, n, portable, "overwrite")
    writeBloom(spark, path, Bloom.build(
      spark.read.parquet(s"$path/fps"), "fp", bloomBits, bloomHashes))
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
    * silently zero every future cross-batch intersection), with the
    * batch's fingerprints OR-merged into the stored Bloom filter (one
    * pass over the batch; the filter words are a bounded driver
    * artifact).
    *
    * Caller owns id uniqueness across batches — and NOT just for
    * hygiene: re-appending an ALREADY-INDEXED id duplicates its (id, h)
    * shingle rows and its (id, n_sh) count row, which INFLATES every
    * future best_jaccard against that doc (j = 2I/(na+nb−2I) > true,
    * up to Infinity for an identical pair) and permanently over-drops
    * later batches. Duplicated fps are the only harmless duplicates (the
    * check collapses hits per batch id). If a replay may have
    * double-appended (the [[graft.streaming.StreamIndexDedup]] crash
    * window), run [[compact]] — it restores exactly the single-append
    * state. `build(a); append(b)` ≡ `build(a ∪ b)` row-identically for
    * DISJOINT ids (asserted in DedupIndexSpec). */
  def append(batch: DataFrame, idCol: String, textCol: String,
             path: String): Unit = {
    val spark = batch.sparkSession
    val (n, portable) = readMeta(spark, path)
    writeParts(batch, idCol, textCol, path, n, portable, "append")
    readBloom(spark, path).foreach { stored =>
      val add = Bloom.build(
        batch.select(TextStats.fingerprint(col(textCol)).as("fp")), "fp",
        stored.numBits, stored.numHashes)
      var i = 0
      while (i < stored.words.length) {
        stored.words(i) |= add.words(i); i += 1
      }
      writeBloom(spark, path, stored)
    }
  }

  /** Mark docs deleted (takedowns, re-curation — the daily 100 TB
    * pipeline's legal reality). Logical and cheap: the ids land in the
    * tombstones sidecar, every subsequent [[checkBatch]] excludes them
    * from all three stored tables, and [[compact]] physically drops the
    * rows (and clears the tombstones). `ids` is any frame carrying
    * `idCol` with the indexed id type. */
  def delete(ids: DataFrame, idCol: String, path: String): Unit =
    ids.select(col(idCol).as("id")).distinct()
      .write.mode("append").parquet(s"$path/tombstones")

  private def tombstones(spark: SparkSession, path: String): Option[DataFrame] =
    IndexFiles.readIfExists(spark, s"$path/tombstones")
      .map(t => broadcast(t.select("id").distinct()))

  /** Rewrite the artifact tables compact AND correct — the maintenance
    * pass a long-lived index needs. Beyond folding the per-append file
    * fan-out back to ~one file per shuffle partition, compact is the
    * index's REPAIR point:
    *
    *   - shingles collapse to DISTINCT (id, h): a double-appended id
    *     (streaming replay) otherwise inflates every future
    *     best_jaccard against it — see [[append]]'s warning
    *   - counts are RECOMPUTED from the compacted shingle table, never
    *     carried over (a duplicated count row is exactly as poisonous)
    *   - fps collapse to DISTINCT (id, fp)
    *   - tombstoned rows are physically dropped from all three tables,
    *     the Bloom filter is REBUILT over the surviving fps (deletion
    *     can only clear bits at rebuild — a Bloom filter cannot unset
    *     incrementally), and the tombstones sidecar is cleared
    *
    * For an index whose appends never reused an id and that has no
    * pending deletes, the rewrite is a pure layout change — same rows,
    * same verdicts (asserted byte-identical in DedupIndexSpec); after a
    * double-append it restores the single-append state (also asserted).
    *
    * Crash-safety: each table stages into a sibling directory and swaps
    * by rename through the Hadoop FileSystem of the index's path — works
    * on any Hadoop-compatible store, not just local disk. Not safe
    * against a CONCURRENT reader across the swap instant — run in the
    * index's write lane, like the appends themselves. */
  def compact(spark: SparkSession, path: String): Unit = {
    def swapIn(part: String, df: DataFrame): Unit = {
      val staged = s"$path/${part}_compacting"
      df.write.mode("overwrite").parquet(staged)
      IndexFiles.swapIn(spark, s"$path/$part", staged)
    }
    val tombs = tombstones(spark, path)
    def live(df: DataFrame): DataFrame =
      tombs.fold(df)(t => df.join(t, Seq("id"), "left_anti"))
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    swapIn("shingles", live(spark.read.parquet(s"$path/shingles"))
      .distinct().repartition(n))
    // counts derive from the JUST-COMPACTED shingles — one aggregate over
    // the deduplicated table, so a duplicated or tombstoned count row
    // cannot survive
    swapIn("counts", spark.read.parquet(s"$path/shingles")
      .groupBy("id").agg(count(lit(1)).as("n_sh")))
    swapIn("fps", live(spark.read.parquet(s"$path/fps")).distinct())
    readBloom(spark, path).foreach { stored =>
      writeBloom(spark, path, Bloom.build(
        spark.read.parquet(s"$path/fps"), "fp",
        stored.numBits, stored.numHashes))
    }
    IndexFiles.remove(spark, s"$path/tombstones")
  }

  /** Highest streaming epoch already folded into the index (None before
    * the first), and its recorder — the replay guard
    * [[graft.streaming.StreamIndexDedup]] uses to make `appendKept`
    * idempotent per epoch. Kept on the index (a parquet sidecar of
    * applied epoch ids) so the guard survives driver restarts with the
    * artifacts it protects. */
  private[graft] def lastAppliedEpoch(spark: SparkSession,
                                      path: String): Option[Long] =
    IndexFiles.readIfExists(spark, s"$path/applied_epochs")
      .flatMap(df => Option(df.agg(max("epoch")).head().get(0))
        .map(_.asInstanceOf[Long]))

  private[graft] def recordAppliedEpoch(spark: SparkSession, path: String,
                                        epoch: Long): Unit = {
    import spark.implicits._
    Seq(epoch).toDF("epoch").write.mode("append")
      .parquet(s"$path/applied_epochs")
  }

  /** Check a batch against the indexed corpus. Output per batch doc
    * (same frame as `Dedup.dedupAgainstCorpus`): `id`,
    * `dropped_exact` (normalized-text fingerprint already in corpus),
    * `best_jaccard` (max exact n-gram Jaccard against any corpus doc
    * sharing ≥ 1 shingle, null when none), and the composite `keep`.
    * Tombstoned corpus docs are excluded from both checks.
    *
    * `useBloom = true` (default) first probes the batch fingerprints
    * against the stored Bloom filter (map-side codegen'd builtins) and
    * SKIPS the exact-dup join entirely when no fingerprint can match —
    * the standard serving optimization for wholly-novel daily batches
    * (the common case): one tiny batch-sided job replaces a scan of the
    * stored fps table. When some fingerprints pass, only THOSE ride the
    * join's broadcast side. No false negatives by Bloom's contract, so
    * verdicts are identical either way (spec-asserted). */
  def checkBatch(batch: DataFrame, idCol: String, textCol: String,
                 path: String, minJaccard: Double,
                 broadcastBatch: Boolean = true,
                 useBloom: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    val (n, portable) = readMeta(spark, path)
    val tombs = tombstones(spark, path)
    def live(df: DataFrame): DataFrame =
      tombs.fold(df)(t => df.join(t, Seq("id"), "left_anti"))
    val bRows = Dedup.shingleHashRows(batch, idCol, textCol, n, portable)
    val cRows = live(spark.read.parquet(s"$path/shingles"))
    val nb = live(spark.read.parquet(s"$path/counts"))
      .select(col("id").as("cid"), col("n_sh").as("nb"))
    val bfp = batch.select(col(idCol).as("id"),
      TextStats.fingerprint(col(textCol)).as("fp"))
    // bloom gate: restrict the exact-dup join's batch side to
    // fingerprints that MIGHT be stored; a wholly-novel batch skips the
    // join (and the stored-fps scan) entirely
    val bloomed = if (useBloom) readBloom(spark, path) else None
    val candFps = bloomed match {
      case Some(f) => bfp.where(Bloom.mightContain(col("fp"), f))
      case None => bfp
    }
    val anyCandidate = bloomed.isEmpty || candFps.limit(1).count() > 0
    val exactHits =
      if (!anyCandidate)
        // optimizes to an empty LocalRelation — no fps scan in the plan
        bfp.where(lit(false)).select(col("id"), lit(1).as("_hit"))
      else {
        // stored-fps ⋈ broadcast(bloom-passing batch fps), collapsed to
        // distinct hit ids: scans the fp table in place and cannot
        // multiply batch rows. Stored ids are dropped (only needed for
        // deletes); `id` below is the BATCH id.
        val side = if (broadcastBatch) broadcast(candFps) else candFps
        live(spark.read.parquet(s"$path/fps")).select("fp")
          .join(side, Seq("fp"))
          .select("id").distinct().withColumn("_hit", lit(1))
      }
    Dedup.assembleCheck(bfp.select("id"), exactHits,
      Dedup.bestJaccardAgainst(bRows, cRows, nb, broadcastBatch), minJaccard)
  }
}
