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
    * ∝ nodes. Lineage is cut every 4 iterations (localCheckpoint, the
    * [[Dedup.componentLabels]] discipline) so the plan doesn't grow
    * exponentially with iteration count. */
  def pageRank(pairs: DataFrame, iters: Int = 10,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters out of range: $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, Seq("src")).localCheckpoint()
    var pr = deg.select(col("src").as("id"), lit(1000000000L).as("prn"))
    val teleportN = (1 - damping) * 1e9
    for (i <- 1 to iters) {
      val msgs = withDeg
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"),
          floor(col("prn").cast("double") / col("deg").cast("double")
            + lit(0.5)).as("_c"))
      val next = msgs.groupBy(col("dst").as("id"))
        .agg(floor(lit(teleportN)
          + lit(damping) * sum(col("_c")).cast("double") + lit(0.5)).as("prn"))
      pr = if (i % 4 == 0 && i < iters) next.localCheckpoint() else next
    }
    pr.join(deg.select(col("src").as("id"), col("deg")), Seq("id"))
      .select(col("id"), col("deg"),
        (col("prn").cast("double") / lit(1e9)).as("pr"))
  }
}
