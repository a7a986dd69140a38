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

  // ---- KML (S15) ----------------------------------------------------------

  private def xmlEscape(c: org.apache.spark.sql.Column) =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  private val trackDdl =
    "bbox ARRAY<DOUBLE>, " +
      "track STRUCT<geometry: STRUCT<type: STRING, coordinates: ARRAY<ARRAY<DOUBLE>>>>, " +
      "features ARRAY<STRUCT<properties: STRUCT<ts: STRING>>>"

  /** One KML `<Placemark>` per track row, built DISTRIBUTED from the
    * GeoJSON strings `GeoJson.trackFeatureCollections` emits (S15 —
    * reference renders the same GeoJSON through a jinja2 KML template:
    * /root/reference/scripts/dac/recent_datasets_to_kml.py:27-59, with
    * per-track start/end timestamps and a status URL). */
  def kmlPlacemarks(df: DataFrame, idCol: String, jsonCol: String,
                    statusUrlTemplate: String = ""): DataFrame = {
    val g = from_json(col(jsonCol),
      org.apache.spark.sql.types.StructType.fromDDL(trackDdl))
    // KML coordinate tuples are lon,lat[,alt] — same order GeoJSON uses
    val coords = array_join(
      expr("transform(_g.track.geometry.coordinates, " +
        "p -> concat(cast(p[0] AS STRING), ',', cast(p[1] AS STRING), ',0'))"), " ")
    // substitute {id} by concatenation, NOT regexp_replace — ids containing
    // '$' or '\' are Matcher metacharacters in a regex replacement string
    val statusUrl: org.apache.spark.sql.Column =
      if (statusUrlTemplate.isEmpty) lit(null)
      else {
        val parts = statusUrlTemplate.split("\\{id\\}", -1)
        val pieces = lit(parts.head) +:
          parts.tail.flatMap(p => Seq(col("_id"), lit(p))).toSeq
        xmlEscape(concat(pieces: _*))
      }
    // try_element_at: a malformed GeoJSON row can parse to an EMPTY
    // features array, and element_at on it throws under ANSI mode (the
    // Spark 4 default) — degrade that row's timestamp range to null
    // (concat_ws skips nulls) instead of failing the whole render
    val desc = concat_ws(" ",
      statusUrl,
      concat(try_element_at(col("_g.features"), lit(1))("properties")("ts"),
        lit(" - "),
        try_element_at(col("_g.features"), lit(-1))("properties")("ts")))
    df.select(col(idCol).cast("string").as("_id"), g.as("_g"))
      .select(col("_id").as("id"),
        concat(
          lit("<Placemark><name>"), xmlEscape(col("_id")), lit("</name>"),
          lit("<description>"), desc, lit("</description>"),
          lit("<LineString><coordinates>"), coords,
          lit("</coordinates></LineString></Placemark>")).as("placemark"))
  }

  /** Assemble the single-document KML report. Collects — KML is one XML
    * document, report-sized by construction (the reference's weekly DAC
    * KML covers dozens of datasets, not bulk data); the per-placemark
    * string building above stays distributed. */
  def kmlDocument(df: DataFrame, idCol: String, jsonCol: String,
                  docName: String, statusUrlTemplate: String = ""): String = {
    val pms = kmlPlacemarks(df, idCol, jsonCol, statusUrlTemplate)
      .orderBy("id").select("placemark").collect().map(_.getString(0))
    val escName = docName.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<kml xmlns="http://www.opengis.net/kml/2.2">
       |<Document><name>$escName</name>
       |${pms.mkString("\n")}
       |</Document>
       |</kml>""".stripMargin
  }

  def kml(df: DataFrame, idCol: String, jsonCol: String, path: String,
          docName: String, statusUrlTemplate: String = ""): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      kmlDocument(df, idCol, jsonCol, docName, statusUrlTemplate)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

  // ---- HTML (S16) ---------------------------------------------------------

  /** `to_html()` analog (S16 — reference
    * scripts/examples/search_datasets.py:35): render a REPORT-SIZED
    * DataFrame as an HTML table. `maxRows` is a hard safety cap — this is
    * a driver-side report formatter, never a bulk sink. */
  def htmlTable(df: DataFrame, maxRows: Int = 10000): String = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val cols = df.columns
    val head = cols.map(c => s"<th>${esc(c)}</th>").mkString
    val rows = df.limit(maxRows).collect().map { r =>
      cols.indices.map { i =>
        val v = r.get(i)
        s"<td>${if (v == null) "" else esc(v.toString)}</td>"
      }.mkString("<tr>", "", "</tr>")
    }
    s"<table border=\"1\"><thead><tr>$head</tr></thead><tbody>${rows.mkString}</tbody></table>"
  }

  def html(df: DataFrame, path: String, maxRows: Int = 10000): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      htmlTable(df, maxRows).getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
