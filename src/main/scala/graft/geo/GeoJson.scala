package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.RoundHalfDown

/** GeoJSON track assembly (reference S14/F15/F16/W2:
  * /root/reference/gdutils/geojson.py:29-86,
  * /root/reference/gdutils/__init__.py:834-869).
  *
  * Per dataset: a FeatureCollection with
  *  - bbox [lon_min, lat_min, lon_max, lat_max], 3 dp (reference widens:
  *    HALF_DOWN on mins, HALF_UP on maxes —
  *    /root/reference/scripts/catalog_dac_datasets.py:75-80);
  *  - one LineString of time-ordered [lon, lat] pairs, 3 dp HALF_DOWN;
  *  - one Point feature per observation with a `ts` ISO-8601 property
  *    (/root/reference/gdutils/geojson.py:74).
  *
  * Built as ONE aggregation per dataset (`array_sort(collect_list(...))`
  * for ordering — no window sort) and serialized with `to_json` on a
  * struct; each dataset's track must fit in one task, which holds for any
  * realistic deployment (≤ millions of points).
  */
object GeoJson {

  private def r3down(c: Column): Column = RoundHalfDown(c, 3)
  private def r3up(c: Column): Column = {
    // HALF_UP == Spark's builtin round for doubles
    round(c, 3)
  }

  def trackFeatureCollections(df: DataFrame, idCol: String, timeCol: String,
                              latCol: String, lonCol: String): DataFrame = {
    val sorted = df.groupBy(col(idCol))
      .agg(
        array_sort(collect_list(struct(
          col(timeCol).as("t"),
          r3down(col(lonCol)).as("lon"),
          r3down(col(latCol)).as("lat")))).as("pts"),
        r3down(min(lonCol)).as("lon_min"), r3up(max(lonCol)).as("lon_max"),
        r3down(min(latCol)).as("lat_min"), r3up(max(latCol)).as("lat_max"))

    val bbox = array(col("lon_min"), col("lat_min"), col("lon_max"), col("lat_max"))
    val lineString = struct(
      lit("Feature").as("type"),
      struct(lit("LineString").as("type"),
        expr("transform(pts, p -> array(p.lon, p.lat))").as("coordinates"))
        .as("geometry"))
    val points = expr(
      """transform(pts, p -> named_struct(
        |  'type', 'Feature',
        |  'geometry', named_struct('type', 'Point',
        |     'coordinates', array(p.lon, p.lat)),
        |  'properties', named_struct(
        |     'ts', date_format(p.t, "yyyy-MM-dd'T'HH:mm:ss'Z'"))))""".stripMargin)

    sorted.select(col(idCol),
      to_json(struct(
        lit("FeatureCollection").as("type"),
        bbox.as("bbox"),
        lineString.as("track"),
        points.as("features"))).as("geojson"))
  }
}
