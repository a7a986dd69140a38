package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Report sinks (SURVEY.md §2.1 S12–S14): CSV, JSON-records, and GeoJSON
  * track files. Distributed writes by default; `single = true` coalesces
  * to one file for the reference's one-report-file shape (only sane for
  * report-sized outputs — never for bulk data).
  */
object Sinks {

  def csv(df: DataFrame, path: String, single: Boolean = false): Unit =
    (if (single) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** JSON-records (`to_json(orient='records')` analog — one JSON object
    * per line). */
  def jsonRecords(df: DataFrame, path: String, single: Boolean = false): Unit =
    (if (single) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).json(path)

  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** GeoJSON track sink: expects (id, geojson-string) rows as produced by
    * GeoJson.trackFeatureCollections; writes one text file tree with each
    * track as a line (`<id>\t<geojson>`). The reference writes one file
    * per dataset from the driver (gdutils/__init__.py:865-867) — at
    * cluster scale per-row driver writes don't fly, so tracks are written
    * as a partitioned text dataset instead. */
  def geojsonTracks(df: DataFrame, idCol: String, jsonCol: String,
                    path: String): Unit =
    df.select(concat_ws("\t", col(idCol), col(jsonCol)).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
}
