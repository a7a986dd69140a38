package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Daily-stats / summary operators — the spine of the reference's flagship
  * `search_datasets` pipeline (SURVEY.md §3.1; A1–A4, A14–A15, W1).
  *
  * The reference computes these with a serial per-dataset Python loop
  * (/root/reference/gdutils/__init__.py:544-616). Here each is ONE
  * data-parallel job over the full long-form table: a single hash
  * aggregation keyed by (id, day) or (id), partial-aggregated map-side, so
  * the only shuffle is the final groupBy exchange. At 100 TB this scales
  * linearly with executors; no driver-side state.
  */
object Profiles {

  /** A1: per-(dataset, day) stats: mean position + row count.
    * pandas `'size'` counts rows including NaN → `count(lit(1))`
    * (/root/reference/gdutils/__init__.py:574-576). */
  def dailyStats(profiles: DataFrame, idCol: String, timeCol: String,
                 latCol: String, lonCol: String): DataFrame =
    profiles
      .groupBy(col(idCol), to_date(col(timeCol)).as("date"))
      .agg(
        avg(latCol).as("latitude"),
        avg(lonCol).as("longitude"),
        count(lit(1)).as("num_profiles"))

  /** Generic A1 variant: per-(id, day) aggregation with caller-supplied
    * aggregate columns. */
  def daily(df: DataFrame, idCol: Column, timeCol: Column, aggs: Column*): DataFrame =
    df.groupBy(idCol, to_date(timeCol).as("date")).agg(aggs.head, aggs.tail: _*)

  /** A2–A4, A15: one summary row per dataset: time coverage, bbox,
    * first-observation (deployment) values, row count, deployment length in
    * days = ceil(Δt/86400) (/root/reference/gdutils/__init__.py:595-616).
    *
    * First-row-after-sort (A4/W1) is expressed as `min(struct(time, tiebreak,
    * payload...))` — a single-pass aggregate, no window/sort needed; the
    * tiebreak column makes it deterministic under time ties.
    */
  def summaries(profiles: DataFrame, idCol: String, timeCol: String,
                latCol: String, lonCol: String, tiebreakCol: String): DataFrame = {
    val t = col(timeCol)
    profiles
      .groupBy(col(idCol))
      .agg(
        min(t).as("start_date"),
        max(t).as("end_date"),
        min(struct(t, col(tiebreakCol), col(latCol), col(lonCol))).as("_first"),
        min(latCol).as("lat_min"), max(latCol).as("lat_max"),
        min(lonCol).as("lon_min"), max(lonCol).as("lon_max"),
        count(lit(1)).as("num_profiles"))
      .withColumn("deployment_lat", col(s"_first.$latCol"))
      .withColumn("deployment_lon", col(s"_first.$lonCol"))
      .drop("_first")
      .withColumn("days",
        ceil((unix_timestamp(col("end_date")) - unix_timestamp(col("start_date"))) / 86400d)
          .cast("long"))
  }

  /** A14: dense deployment-day range per dataset — every calendar day from
    * first to last observation, INCLUDING gap days
    * (/root/reference/gdutils/__init__.py:587-589). `sequence` + `explode`
    * runs inside codegen; output is long-form (id, day). */
  def deploymentDays(profiles: DataFrame, idCol: String, timeCol: String): DataFrame =
    profiles
      .groupBy(col(idCol))
      .agg(to_date(min(timeCol)).as("_d0"), to_date(max(timeCol)).as("_d1"))
      .select(col(idCol),
        explode(sequence(col("_d0"), col("_d1"))).as("day"))

  /** W2: ordered per-key "track" assembly — the time-ordered list of
    * payload values per key (/root/reference/gdutils/geojson.py:45-61).
    * `array_sort(collect_list(struct(...)))` avoids a window sort: one
    * aggregation, sorting only within each key's (small) collected array.
    * Struct field order (time, tiebreak, payload) gives deterministic order
    * under time ties. */
  def orderedTrack(df: DataFrame, idCol: String, timeCol: String,
                   tiebreakCol: String, payload: Column): DataFrame =
    df.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col(timeCol), col(tiebreakCol),
        payload.as("payload")))).as("_sorted"))
      .select(col(idCol), expr("transform(_sorted, x -> x.payload)").as("track"))
}
