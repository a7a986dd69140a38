package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Catalog search with spatio-temporal predicates (SURVEY.md §2.1 S2,
  * §2.2 P12/P14): the reference pushes bbox/time/text params into an
  * ERDDAP advanced-search URL (/root/reference/gdutils/__init__.py:474-507);
  * here the same predicates are Column filters over the summaries/catalog
  * table, which Catalyst pushes into the scan.
  *
  * Overlap semantics (matching ERDDAP advanced search): a dataset matches
  * a bbox/time window if its coverage INTERSECTS the window, not only if
  * fully contained.
  */
object Catalog {

  final case class BBox(lonMin: Double, latMin: Double,
                        lonMax: Double, latMax: Double)

  def bboxPredicate(b: BBox): Column =
    col("lon_min") <= b.lonMax && col("lon_max") >= b.lonMin &&
      col("lat_min") <= b.latMax && col("lat_max") >= b.latMin

  def timeOverlapPredicate(minTime: Option[String], maxTime: Option[String]): Column = {
    val lo = minTime.map(t => col("end_date") >= lit(t)).getOrElse(lit(true))
    val hi = maxTime.map(t => col("start_date") <= lit(t)).getOrElse(lit(true))
    lo && hi
  }

  /** Case-insensitive free-text match over id/title-ish columns. */
  def textPredicate(searchFor: String, cols: Seq[String]): Column =
    cols.map(c => lower(col(c)).contains(searchFor.toLowerCase))
      .reduce(_ || _)

  /** S2: composed parameterized search over a summaries/catalog table. */
  def search(catalog: DataFrame,
             bbox: Option[BBox] = None,
             minTime: Option[String] = None,
             maxTime: Option[String] = None,
             searchFor: Option[String] = None,
             textCols: Seq[String] = Seq("dataset_id")): DataFrame = {
    var out = catalog
    bbox.foreach(b => out = out.where(bboxPredicate(b)))
    if (minTime.isDefined || maxTime.isDefined)
      out = out.where(timeOverlapPredicate(minTime, maxTime))
    searchFor.foreach(s => out = out.where(textPredicate(s, textCols)))
    out
  }

  /** S5 + SURVEY §7.4.8: WMO-id resolution per dataset — more than one
    * distinct non-null wmo_id means the id is treated as ABSENT
    * (/root/reference/gdutils/__init__.py:459-460), so `first` would be
    * wrong; a distinct-count guard is required. */
  def wmoIds(obs: DataFrame, idCol: String, wmoCol: String): DataFrame =
    obs.groupBy(col(idCol))
      .agg(countDistinct(col(wmoCol)).as("_n"), max(col(wmoCol)).as("_w"))
      .select(col(idCol),
        when(col("_n") === 1, col("_w")).otherwise(lit(null)).as("wmo_id"))
}
