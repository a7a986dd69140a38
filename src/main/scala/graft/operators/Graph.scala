package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over candidate-pair frames (the output
  * shape of the dedup family: (id_a, id_b) near-dup pairs). Complements
  * [[Dedup.componentLabels]] (connected components): where components
  * tell you WHICH docs form a duplicate cluster, centrality tells you
  * which doc is the cluster's canonical representative — the standard
  * "pick the hub, drop the satellites" curation refinement.
  */
object Graph {

  /** Unnormalized PageRank (damping d, teleport 1−d, pr₀ = 1 — the
    * N-factored-out formulation, so no corpus count is needed) over the
    * UNDIRECTED graph induced by `pairs` (both directions added, pairs
    * deduped). A fixed `iters` power iterations carried as INTEGER
    * nano-ranks (prn = pr·1e9): per-edge contributions are
    * floor(prn/deg + 0.5) longs — summed exactly in any partition
    * order — and each iteration re-grids via the same explicit
    * floor(x + 0.5), the sq8 discipline. No engine `round` anywhere:
    * rank/deg quotients land EXACTLY on .5 ties whenever deg is a
    * power of two, where HALF_UP (Spark) and half-even (DuckDB) split —
    * measured as a real 1-ulp divergence at sf0.1 before this
    * formulation. The SQL oracle replays all iterations as chained
    * CTEs, bit-identically.
    *
    * Output: (id, deg, pr) for every node that appears in a pair.
    * Isolated docs never enter (their rank is the teleport constant by
    * definition — join them back with a literal if needed).
    *
    * Scale shape: one edge-build shuffle (union + distinct), one degree
    * aggregate, then per iteration ONE equi-join on the source id + ONE
    * map-side-combinable sum — no windows, no driver-side graph, state
    * ∝ nodes. Lineage is cut at every `checkEvery`-round block boundary
    * (localCheckpoint, the [[Dedup.componentLabels]] discipline), and
    * each boundary also takes an exact CONVERGENCE EARLY-EXIT check:
    * the L1 delta between the boundary iterate and its IMMEDIATE
    * predecessor (an aggregate over two materialized nodes-sized
    * frames) is 0 exactly when the integer nano-rank vector hit a grid
    * fixed point — the iteration is a pure function of the previous
    * vector, so every remaining round would return the SAME frame and
    * the exit is result-identical to running all `iters` (the q_d16
    * oracle replays all rounds unconditionally and hashes equal; the
    * executed-round count replays as the same boundary schedule).
    * Consecutive iterates, never block-apart snapshots: the floor
    * re-grid admits small limit cycles in principle, and p_{t+k} ==
    * p_t alone would not certify a fixed point. Block-amortized
    * checking (not per-round) keeps the non-converging cost profile at
    * the old checkpoint-every-4 shape: measured per-round delta checks
    * cost ~0.1 s/round of pure job overhead at bench scale while a
    * boundary check adds one tiny join per 4 rounds. */
  def pageRank(pairs: DataFrame, iters: Int = 10,
               damping: Double = 0.85): DataFrame =
    pageRankRun(pairs, iters, damping).ranks

  /** [[pageRank]]'s result plus the number of power iterations actually
    * EXECUTED (`rounds` ≤ `iters`): `iters` unless a block boundary
    * measured delta == 0, in which case that boundary round (the work
    * that proved the fixed point) is the last one counted. */
  final case class PageRankResult(ranks: DataFrame, rounds: Int)

  def pageRankRun(pairs: DataFrame, iters: Int = 10,
                  damping: Double = 0.85,
                  checkEvery: Int = 4): PageRankResult = {
    require(iters >= 1 && iters <= 100, s"iters out of range: $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    require(checkEvery >= 1, s"checkEvery must be positive: $checkEvery")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
    // deg is nodes-sized and read THREE times (withDeg build, pr₀ seed,
    // final output join); materialize it once so the pair pipeline +
    // union/distinct/aggregate behind it doesn't re-execute for the seed
    // and the output join — at 100 TB each recompute is a full
    // candidate-pair shuffle, at bench scale it was two extra copies of
    // the whole shingle subtree in the final plan (86 → ~10 Exchanges).
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // (round-14 audit: hash-partitioning withDeg by src + persist, to
    // make the per-iteration join exchange-free, measured ×1.06 SLOWER
    // at bench scale — the AQE-coalesced per-iteration exchanges are
    // near-free here; kept the simple materialization)
    val withDeg = edges.join(deg, Seq("src")).localCheckpoint()
    var pr = deg.select(col("src").as("id"), lit(1000000000L).as("prn"))
    var prMaterialized = false
    val teleportN = (1 - damping) * 1e9
    var rounds = 0
    var converged = false
    while (rounds < iters && !converged) {
      val t = rounds + 1
      // no check on the final round: there is no exit left to take and
      // the executed-round count is `iters` either way, so the delta
      // join would be pure overhead (the oracle's schedule matches)
      val check = t % checkEvery == 0 && t < iters
      if (check && !prMaterialized) pr = pr.localCheckpoint()
      val msgs = withDeg
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"),
          floor(col("prn").cast("double") / col("deg").cast("double")
            + lit(0.5)).as("_c"))
      val next = msgs.groupBy(col("dst").as("id"))
        .agg(floor(lit(teleportN)
          + lit(damping) * sum(col("_c")).cast("double") + lit(0.5)).as("prn"))
      rounds = t
      if (check) {
        // every node has an incoming edge (undirected), so the id sets
        // of next and pr are identical and the inner join carries the
        // full vector; pr was just materialized, so both the message
        // pass and the _prev side read the same cached blocks, and the
        // LAZY checkpoint materializes the new iterate inside the delta
        // fold's own job
        val staged = next
          .join(pr.select(col("id"), col("prn").as("_prev")), Seq("id"))
          .localCheckpoint(false)
        val delta = Option(
            staged.agg(sum(abs(col("prn") - col("_prev")))).head().get(0))
          .map(_.asInstanceOf[Long]).getOrElse(0L) // empty graph: done
        converged = delta == 0L
        pr = staged.drop("_prev")
        prMaterialized = true
      } else {
        pr = next
        prMaterialized = false
      }
    }
    PageRankResult(
      pr.join(deg.select(col("src").as("id"), col("deg")), Seq("id"))
        .select(col("id"), col("deg"),
          (col("prn").cast("double") / lit(1e9)).as("pr")),
      rounds)
  }
}
