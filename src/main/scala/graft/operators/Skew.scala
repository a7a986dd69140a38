package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for hot keys at cluster scale.
  *
  * AQE's runtime skew-join splitting handles most cases (enabled in every
  * graft session); these helpers cover the two situations AQE can't:
  * a hash AGGREGATION whose single hot key overwhelms one reducer, and a
  * shuffle join against a dimension small enough to replicate but too big
  * to broadcast outright.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(keys + salt) partial, then
    * groupBy(keys) merge. Decomposable aggregates only (count/sum/min/
    * max); the hot key's rows spread over `saltBuckets` reducers in
    * phase 1, and phase 2 touches `saltBuckets` rows per key.
    *
    * aggs maps output column name → (partial aggregate of the input,
    * merge aggregate of the partial column). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                aggs: Map[String, (Column, String => Column)]): DataFrame = {
    val salted = df.withColumn("_salt",
      (rand(42) * saltBuckets).cast("int"))
    val partialCols = aggs.map { case (name, (partial, _)) =>
      partial.as(s"_p_$name")
    }.toSeq
    val partial = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val mergeCols = aggs.map { case (name, (_, merge)) =>
      merge(s"_p_$name").as(name)
    }.toSeq
    partial.groupBy(keys.map(col): _*).agg(mergeCols.head, mergeCols.tail: _*)
  }

  /** Convenience: salted count + sum. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltBuckets: Int = 16): DataFrame =
    saltedAgg(df, keys, saltBuckets, Map(
      "n" -> (count(lit(1)), (c: String) => sum(col(c)).cast("long")),
      "total" -> (sum(col(valueCol)), (c: String) => sum(col(c)))))

  /** Salted join for a skewed fact against a replicable dimension: the
    * fact side gets a random salt in [0, saltBuckets); the dimension is
    * exploded ×saltBuckets so every (key, salt) bucket finds its match.
    * Semantics = plain equi-join (`inner` or `left`: each fact row's
    * salt matches exactly one replica-set row per dim match, and an
    * unmatched left row survives exactly once); the hot key's probe rows
    * spread over saltBuckets tasks. right/full would need the mirror
    * construction (salt the dim, replicate the fact) — rejected loudly
    * rather than risk duplicate unmatched rows. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int = 16, joinType: String = "inner"): DataFrame = {
    val ok = Set("inner", "left", "left_outer")
    require(ok.contains(joinType), s"joinType must be one of $ok")
    Seq(fact, dim).foreach(df =>
      require(!df.columns.contains("_salt"),
        "input column '_salt' collides with salting internals — alias it"))
    val saltedFact = fact.withColumn("_salt",
      (rand(42) * saltBuckets).cast("int"))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Equi-join CARDINALITY diagnostic — the exact output size an
    * equi-join on `key` would produce, computed WITHOUT running it:
    * Σ_k cl(k)·cr(k) over shared keys, plus the hottest key's
    * contribution (the row that tells you whether you need [[saltedJoin]]
    * before you've burned the cluster discovering it). Self-joins (pass
    * the same frame twice) make this the candidate-pair-explosion check
    * the dedup/ANN family runs conceptually — Σ c(k)² IS the bucket
    * join's output size.
    *
    * Scale shape: two per-key count aggregates (map-side combinable),
    * one count-table equi-join bounded by KEY cardinality (never rows),
    * exact BIGINT products; one row out. */
  def joinCardinality(left: DataFrame, right: DataFrame,
                      key: String): DataFrame = {
    val ca = left.groupBy(col(key).as("_k")).agg(count(lit(1)).as("_cl"))
    val cb = right.groupBy(col(key).as("_k")).agg(count(lit(1)).as("_cr"))
    val tots = ca.agg(sum(col("_cl")).as("n_left"),
        count(lit(1)).as("keys_left"))
      .crossJoin(cb.agg(sum(col("_cr")).as("n_right"),
        count(lit(1)).as("keys_right")))
    val j = ca.join(cb, Seq("_k"))
      .agg(count(lit(1)).as("keys_shared"),
        coalesce(sum(col("_cl") * col("_cr")), lit(0L)).as("est_rows"),
        max(col("_cl") * col("_cr")).as("max_key_rows"))
    tots.crossJoin(broadcast(j))
      .select(col("n_left"), col("n_right"), col("keys_left"),
        col("keys_right"), col("keys_shared"), col("est_rows"),
        col("max_key_rows"),
        when(col("est_rows") > 0,
          round(col("max_key_rows").cast("double")
            / col("est_rows").cast("double"), 6)).as("hot_key_frac"))
  }

  /** Key-skew DIAGNOSTIC — the detector that tells you whether the
    * mitigations above (or AQE) are even needed: one row of
    * (n_keys, n_rows, max_count, p<q>_count, mean_count, gini) for a
    * prospective shuffle key. Gini 0 = perfectly balanced keys, → 1 =
    * one key owns everything; p99_count is the rank-defined size
    * (smallest count with ≥ ⌈q·n_keys⌉ keys at or below it — the
    * percentileGate discipline, no interpolation).
    *
    * Scale shape: the per-key count is the one key-cardinality
    * aggregate (map-side combinable — and it is exactly the shuffle
    * being diagnosed, run once as a dry run); everything after folds
    * over the COUNT-OF-COUNTS histogram, bounded by distinct sizes,
    * never keys. The Gini rank-sum uses the block form Σ s·(k·r₀ +
    * k(k+1)/2) over same-size blocks — exact BIGINTs (k(k+1) is even,
    * halved by shiftright) until the two final fixed-order divisions,
    * so a SQL oracle replays the doubles. */
  def keySkewReport(df: DataFrame, keyCols: Seq[String],
                    q: Double = 0.99): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(q > 0.0 && q <= 1.0, s"q out of (0,1]: $q")
    import org.apache.spark.sql.expressions.Window
    val cnt = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_c"))
    val coc = cnt.groupBy("_c").agg(count(lit(1)).as("_k"))
    val wCum = Window.orderBy("_c").rowsBetween(Window.unboundedPreceding, 0)
    val wPrev = Window.orderBy("_c").rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val en = coc
      .withColumn("_cumk", sum(col("_k")).over(wCum))
      .withColumn("_prevk", coalesce(sum(col("_k")).over(wPrev), lit(0L)))
      .withColumn("_nk", sum(col("_k")).over(wAll))
      .withColumn("_nr", sum(col("_c") * col("_k")).over(wAll))
      .withColumn("_mx", max(col("_c")).over(wAll))
      .withColumn("_sterm", col("_c") * (col("_k") * col("_prevk")
        + shiftright(col("_k") * (col("_k") + lit(1L)), 1)))
    en.agg(max(col("_nk")).as("n_keys"), max(col("_nr")).as("n_rows"),
        max(col("_mx")).as("max_count"), sum(col("_sterm")).as("_s"),
        min(when(col("_cumk") >= ceil(lit(q) * col("_nk").cast("double")),
          col("_c"))).as("p_count"))
      .select(col("n_keys"), col("n_rows"), col("max_count"),
        col("p_count").as(s"p${(q * 100).round}_count"),
        round(col("n_rows").cast("double") / col("n_keys").cast("double"), 6)
          .as("mean_count"),
        round(lit(2.0) * col("_s").cast("double")
            / col("n_keys").cast("double") / col("n_rows").cast("double")
          - (col("n_keys") + lit(1L)).cast("double")
            / col("n_keys").cast("double"), 6).as("gini"))
  }
}
