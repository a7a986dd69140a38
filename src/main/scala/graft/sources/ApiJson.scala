package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REST-API JSON sources (SURVEY.md §2.1 S7/S8): the DAC registration API
  * and the status API. The reference fetches JSON then post-hoc casts
  * (/root/reference/gdutils/apis/dac.py:10-46,
  * /root/reference/gdutils/apis/status.py:10-56); here the cast pipeline
  * is declarative over `spark.read.json`, so it distributes over any
  * number of JSON files and the casts run in codegen.
  */
object ApiJson {

  /** DAC registration scan: drop scratch columns, normalize `name` →
    * dataset_id, null-safe bool flags (fillna(False)), epoch-millis →
    * timestamps (the reference divides by 1000 then intends unit-seconds,
    * dac.py:44 — effective behavior is millis → timestamp). */
  def dacRegistrations(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    val boolCols = Seq("archive_safe", "completed", "compliance_check_passed",
      "delayed_mode").filter(raw.columns.contains)
    val tsCols = Seq("created", "updated", "deployment_date",
      "latest_file_mtime").filter(raw.columns.contains)
    val dropped = Seq("estimated_deploy_date", "estimated_deploy_location")
      .filter(raw.columns.contains)
    val base = raw
      .drop(dropped: _*)
      .withColumnRenamed("name", "dataset_id")
    val withBools = boolCols.foldLeft(base)((df, c) =>
      df.withColumn(c, coalesce(col(c).cast("boolean"), lit(false))))
    tsCols.foldLeft(withBools)((df, c) =>
      df.withColumn(c, timestamp_millis(expr(s"try_cast(`$c` AS BIGINT)"))))
  }

  /** Status API scan: int 0/1 → bool, nullable counts filled to 0,
    * string timestamps coerced (invalid → null), float casts, and the
    * derived `orphaned` flag = tabledap IS NULL (status.py:53-54). */
  def status(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    val boolCols = Seq("archive_safe", "completed", "compliance_check_passed",
      "delayed_mode").filter(raw.columns.contains)
    val intCols = Seq("num_profiles", "days").filter(raw.columns.contains)
    val tsCols = Seq("created", "latest_file_mtime", "start_date", "end_date")
      .filter(raw.columns.contains)
    val floatCols = Seq("deployment_lat", "deployment_lon", "lat_min",
      "lat_max", "lon_min", "lon_max").filter(raw.columns.contains)
    val b = boolCols.foldLeft(raw)((df, c) =>
      df.withColumn(c, col(c).cast("int") === 1))
    val i = intCols.foldLeft(b)((df, c) =>
      df.withColumn(c, coalesce(col(c).cast("long"), lit(0L))))
    val t = tsCols.foldLeft(i)((df, c) =>
      df.withColumn(c, expr(s"try_to_timestamp(`$c`)")))
    val f = floatCols.foldLeft(t)((df, c) =>
      df.withColumn(c, col(c).cast("double")))
    f.withColumn("orphaned",
      if (f.columns.contains("tabledap")) col("tabledap").isNull else lit(false))
  }
}
