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
}
