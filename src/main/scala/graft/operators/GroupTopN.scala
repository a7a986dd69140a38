package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BoundedTopK

/** Shared "smallest n items per key" aggregation — the window-free top-n
  * shape used by `Similarity.topKPerQuery` (rank by negated cosine) and
  * `Sampling.capPerGroup` (rank by id hash).
  *
  * One hash aggregate over the custom `BoundedTopK` typed aggregate:
  * state is a k-bounded heap (memory ∝ k, not group size), the map side
  * partial-combines, and the single exchange carries ≤ n items per
  * (key, map task) — no task ever holds or sorts one key's full item
  * list. Ordering is the struct's natural field order — callers encode
  * their sort in the item struct (first fields compare first).
  *
  * (Earlier form: two-phase `slice(array_sort(collect_list))` keyed by
  * (key, spark_partition_id) — same shuffle volume, but collect_list's
  * unbounded per-group state and a second exchange. The bounded
  * aggregate strictly dominates it.)
  */
private[graft] object GroupTopN {

  /** Returns one row per key: (keyCol, _top: array<item>) with the n
    * smallest items in ascending struct order. */
  def smallestPerKey(df: DataFrame, keyCol: String, item: Column,
                     n: Int): DataFrame =
    df.select(col(keyCol).as("_key"), item.as("_it"))
      .groupBy("_key")
      .agg(BoundedTopK.smallestK(col("_it"), n).as("_top"))
      .select(col("_key").as(keyCol), col("_top"))
}
