package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared two-phase "smallest n items per key" aggregation — the
  * window-free top-n shape used by `Similarity.topKPerQuery` (rank by
  * negated cosine) and `Sampling.capPerGroup` (rank by id hash).
  *
  * Phase 1 slices each map partition's contribution to n per
  * (key, spark_partition_id()), so the final per-key aggregate sees
  * ≤ n·numPartitions items and no single task ever sorts one key's full
  * item list. Ordering is the struct's natural field order — callers
  * encode their sort in the item struct (first fields compare first). */
private[graft] object GroupTopN {

  /** Returns one row per key: (keyCol, _top: array<item>) with the n
    * smallest items in ascending struct order. */
  def smallestPerKey(df: DataFrame, keyCol: String, item: Column,
                     n: Int): DataFrame = {
    val partial = df
      .select(col(keyCol).as("_key"), item.as("_it"))
      .withColumn("_pid", spark_partition_id())
      .groupBy("_key", "_pid")
      .agg(slice(array_sort(collect_list(col("_it"))), 1, n).as("_top"))
      .select(col("_key"), explode(col("_top")).as("_it"))
    partial
      .groupBy("_key")
      .agg(slice(array_sort(collect_list(col("_it"))), 1, n).as("_top"))
      .select(col("_key").as(keyCol), col("_top"))
  }
}
