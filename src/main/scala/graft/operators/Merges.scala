package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3 J1–J7).
  *
  * Every reference join is an equi-join on `dataset_id` against a
  * catalog-sized table (/root/reference/gdutils/__init__.py:107-114,
  * 921-941) — on a cluster those sides are broadcast; we mark them
  * explicitly so the plan never falls back to a shuffle join when stats
  * are missing. The big-side table streams map-side through the
  * BroadcastHashJoin inside whole-stage codegen.
  */
object Merges {

  /** J1: summaries ⟕ info on the key (the `datasets` property,
    * /root/reference/gdutils/__init__.py:107-114). `info` is
    * catalog-sized → broadcast. */
  def joinInfo(summaries: DataFrame, info: DataFrame, key: String): DataFrame =
    summaries.join(broadcast(info), Seq(key), "left")

  /** J2/J3: API registrations ⟕/⟖ ERDDAP catalog
    * (/root/reference/gdutils/__init__.py:921-939; direction chosen by
    * `merge_all`). */
  def mergeWithApi(api: DataFrame, erddap: DataFrame, key: String,
                   mergeAll: Boolean): DataFrame = {
    val how = if (mergeAll) "left" else "right"
    api.join(erddap, Seq(key), how)
  }

  /** J4: orphan flag — registered in the API but absent from ERDDAP ⇒ the
    * probe column from the right side is null after the left join
    * (/root/reference/gdutils/__init__.py:940-941). */
  def withOrphanFlag(merged: DataFrame, probeCol: String): DataFrame =
    merged.withColumn("orphaned", col(probeCol).isNull)

  /** The orphan SET itself is an anti-join (same semantics, no flag col). */
  def orphans(api: DataFrame, erddap: DataFrame, key: String): DataFrame =
    api.join(erddap.select(key), Seq(key), "left_anti")

  /** J5: inner lookup-join + column overlay: values from `patch` win where
    * present (`dict.update` in the reference,
    * /root/reference/scripts/catalog_dac_datasets.py:65-83). */
  def overlay(base: DataFrame, patch: DataFrame, key: String,
              overlayCols: Seq[String]): DataFrame = {
    val p = broadcast(patch.select((key +: overlayCols).map(c => col(c).as(
      if (c == key) c else s"_p_$c")).toIndexedSeq: _*))
    val joined = base.join(p, Seq(key), "inner")
    overlayCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, coalesce(col(s"_p_$c"), col(c))).drop(s"_p_$c")
    }
  }

  /** J7: delayed-twin flag — does `<id>-delayed` exist in the catalog?
    * Left-semi self-join on the derived key
    * (/root/reference/scripts/build_dac_ioos_datasets_report.py:56-57). */
  def delayedTwinFlag(catalog: DataFrame, key: String): DataFrame = {
    val twins = catalog.select(col(key).as("_twin_id"))
    catalog
      .join(broadcast(twins),
        concat(col(key), lit("-delayed")) === col("_twin_id"), "left")
      .withColumn("has_delayed_twin", col("_twin_id").isNotNull)
      .drop("_twin_id")
  }
}
