package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance similarity join — record linkage / fuzzy title
  * dedup ("are these two near-identical strings the same record"), the
  * string-metric sibling of the LSH pair generators. Reference analog:
  * the dataset_id-exact merges of `gdutils/__init__.py:51,412` — this
  * is the same record-matching step made typo-tolerant (superset
  * scope, like the rest of the X-family).
  *
  * Semantics contract (the LSH discipline): EXACT precision — every
  * emitted pair truly has levenshtein ≤ maxDist — with BLOCKING recall:
  * only pairs sharing a block key are compared, so the caller picks the
  * block to over-cover (the q_d1 two-token prefix for titles, a
  * normalized length band, a phonetic key, …). Pairs split across
  * blocks are the documented misses, exactly like LSH band misses.
  *
  * Scale shape: one equi-join on the block key; per-block cost is
  * quadratic so oversized blocks are dropped by the q_d2 guard (a
  * map-side-combinable groupBy count finds the FEW pathological keys,
  * a broadcast anti-join drops their rows — the guard itself never
  * funnels a hot key into one task). The |len_a − len_b| ≤ maxDist
  * pre-filter (a true lower bound on edit distance) prunes candidates
  * before the O(len²) levenshtein kernel runs; the kernel itself is
  * Spark's codegen'd `levenshtein`, map-side on joined rows.
  */
object Fuzzy {

  /** Pairs (id_a < id_b) within a block with edit distance ≤ maxDist.
    * Output: (id_a, id_b, dist). `blockKey` is evaluated against `df`'s
    * columns; duplicate (id, block) rows should be pre-deduped by the
    * caller if ids can repeat. If `strCol`/`blockKey` share an expensive
    * subexpression (a tokenizer), materialize it first
    * ([[Dedup.withWords]]) — CollapseProject otherwise inlines it into
    * BOTH columns and it evaluates twice per row. */
  def blockedEditJoin(df: DataFrame, idCol: String, strCol: Column,
                      blockKey: Column, maxDist: Int,
                      maxBlock: Int = 1000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    require(maxBlock > 1, s"maxBlock must allow a pair: $maxBlock")
    joinOnBlocks(
      df.select(col(idCol).as("_id"), strCol.as("_s"), blockKey.as("_b")),
      maxDist, maxBlock)
  }

  /** [[blockedEditJoin]] with the block key DERIVED: width-`maxDist`
    * length bands, each row emitted into its own band and the next —
    * any true pair has |Δlen| ≤ maxDist, so its band indices differ by
    * at most 1 and the two emissions always share a key. Length-wise
    * recall is EXACT — no blocking misses for pairs within `maxDist`
    * (spec-pinned on planted typos) — PROVIDED no band trips the
    * `maxBlock` guard; callers reach for the custom-key form only when
    * they have a semantic key (title prefix, phonetic code) that prunes
    * harder than length can. Pairs landing in both shared bands are
    * deduped by the final distinct (dist is deterministic per pair).
    * Cost shape: 2× the block-join rows of a single-key blocking, same
    * guard, same one equi-join.
    *
    * Band-collapse guard: length banding silently degenerates when the
    * corpus's length variance is at or below the band width — most rows
    * fall into one or two fat bands, and the guard's per-band cap would
    * then DROP those bands, silently losing true pairs (contradicting
    * the exact-recall contract), while raising `maxBlock` to keep them
    * turns the join quadratic. So unlike [[blockedEditJoin]] (whose
    * contract is blocking recall, where dropping a hot block is the
    * documented behavior), this operator checks band occupancy UP FRONT
    * and FAILS LOUD when any band exceeds `maxBlock`, naming the fat
    * bands and the escape hatches: a semantic block key via
    * [[blockedEditJoin]], a larger `maxBlock` (quadratic in the fattest
    * band), or `onCollapse = "drop"` to accept the silent recall loss
    * explicitly. The check is one map-side-combinable count over the
    * banded rows — cheap next to the self-join it protects. */
  def lengthBandEditJoin(df: DataFrame, idCol: String, strCol: Column,
                         maxDist: Int, maxBlock: Int = 1000,
                         onCollapse: String = "error"): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    require(maxBlock > 1, s"maxBlock must allow a pair: $maxBlock")
    require(Set("error", "drop")(onCollapse),
      s"onCollapse must be 'error' or 'drop': $onCollapse")
    val w = math.max(maxDist, 1)
    val band = floor(length(col("_s")) / lit(w)).cast("long")
    val rows = df.select(col(idCol).as("_id"), strCol.as("_s"))
      .select(col("_id"), col("_s"),
        explode(array(band, band + lit(1L))).as("_b"))
    if (onCollapse == "error") {
      val over = rows.groupBy("_b").agg(count(lit(1)).as("_c"))
        .where(col("_c") > maxBlock)
        .agg(count(lit(1)).as("n_over"), max("_c").as("max_c"),
          sum(col("_c") * col("_c")).as("sum_sq"))
        .head()
      if (over.getLong(0) > 0L)
        throw new IllegalStateException(
          s"lengthBandEditJoin band collapse: ${over.getLong(0)} band(s) " +
          s"exceed maxBlock=$maxBlock (fattest: ${over.getLong(1)} rows, " +
          s"Σ|band|² over oversized bands: ${over.getLong(2)}) — the " +
          "corpus's length variance is too low for width-" + w + " bands " +
          "(exact recall would be silently lost by dropping them). Use " +
          "blockedEditJoin with a semantic key, raise maxBlock, or pass " +
          "onCollapse = \"drop\" to accept the recall loss.")
    }
    joinOnBlocks(rows, maxDist, maxBlock).distinct()
  }

  /** The shared core: guard oversized blocks, self-join on `_b`, length
    * pre-filter, exact levenshtein gate. The repartition makes the
    * (id, str, block) construction run ONCE behind a single exchange
    * that the guard count and BOTH self-join sides reuse (ReusedExchange
    * — measured: dropping it or persisting instead is timing-neutral
    * within one execution, and the repartition needs no cache
    * lifecycle). */
  private def joinOnBlocks(prepared: DataFrame, maxDist: Int,
                           maxBlock: Int): DataFrame = {
    val rows = prepared.repartition(col("_b"))
    val oversized = rows.groupBy("_b").agg(count(lit(1)).as("_c"))
      .where(col("_c") > maxBlock).select("_b")
    val pruned = rows.join(broadcast(oversized), Seq("_b"), "left_anti")
    pruned.as("a").join(pruned.as("b"),
        col("a._b") === col("b._b") && col("a._id") < col("b._id")
          // |Δlen| lower-bounds edit distance: free prune before the DP
          && abs(length(col("a._s")) - length(col("b._s"))) <= maxDist)
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        levenshtein(col("a._s"), col("b._s")).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
  }
}
