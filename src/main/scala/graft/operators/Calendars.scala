package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calendar / roll-up operators (SURVEY.md §2.4 A7–A13) — the reference's
  * signature output shape: (year,month)×day, year×month, month×day pivot
  * matrices (e.g. /root/reference/gdutils/__init__.py:161-180).
  *
  * Data stays LONG-form until the presentation edge; the pivot is the last
  * step and uses an EXPLICIT value list (1–31 / 1–12), which (a) avoids
  * Spark's extra distinct-values job, and (b) reproduces the reference's
  * "all day columns always present" behavior
  * (/root/reference/gdutils/__init__.py:171-175). Missing cells are null,
  * not 0 (pandas NaN semantics). Note the reference's `reindex` of missing
  * (year,month) ROWS is a no-op in the original (result discarded, e.g.
  * /root/reference/gdutils/__init__.py:169) — we replicate the effective
  * behavior: column fill only.
  *
  * Scale: a pivot here is one shuffle keyed by (year,month) — at most a few
  * thousand groups regardless of input size, after a map-side partial
  * aggregate over (year,month,day). Input rows never reach the driver.
  */
object Calendars {

  private def dayCols: Seq[Any] = (1 to 31).map(d => d: Any)
  private def monthCols: Seq[Any] = (1 to 12).map(m => m: Any)

  /** Zero-pad pivot column names (1 -> d01) so lexicographic column order
    * equals day order — also what the oracle SQL emits. */
  private def renamePivoted(df: DataFrame, prefix: String): DataFrame = {
    val renamed = df.columns.map { c =>
      if (c.forall(_.isDigit)) f"$prefix${c.toInt}%02d" else c
    }
    df.toDF(renamed.toIndexedSeq: _*)
  }

  /** A10 ymd: (year, month) × day-of-month matrix of sum(valueCol). */
  def ymdCalendar(df: DataFrame, dateCol: String, value: Column): DataFrame =
    renamePivoted(
      df.groupBy(year(col(dateCol)).cast("long").as("year"),
                 month(col(dateCol)).cast("long").as("month"))
        .pivot(dayofmonth(col(dateCol)), dayCols)
        .agg(sum(value)),
      "d")

  /** A10 ym: year × month matrix. */
  def ymCalendar(df: DataFrame, dateCol: String, value: Column): DataFrame =
    renamePivoted(
      df.groupBy(year(col(dateCol)).cast("long").as("year"))
        .pivot(month(col(dateCol)), monthCols)
        .agg(sum(value)),
      "m")

  /** A10 md: month × day matrix (seasonal view across years).
    * Divergence from the reference, intentional: its
    * `md_observations_calendar` accidentally groups by (year, month)
    * instead of (month, day) (/root/reference/gdutils/osmc/__init__.py:163-164,
    * a known bug per SURVEY §7.4.6) — this is the intended seasonal
    * semantics, not the bug. */
  def mdCalendar(df: DataFrame, dateCol: String, value: Column): DataFrame =
    renamePivoted(
      df.groupBy(month(col(dateCol)).cast("long").as("month"))
        .pivot(dayofmonth(col(dateCol)), dayCols)
        .agg(sum(value)),
      "d")

  /** A10 "glider days" flavor: (year, month) × day matrix of DISTINCT
    * active ids (the reference's `days.any().sum(axis=1)` per calendar
    * cell). Cells with no active id are null (pivot semantics), matching
    * the reference's NaN. */
  def ymdCalendarDistinct(df: DataFrame, dateCol: String, idCol: String): DataFrame =
    renamePivoted(
      df.groupBy(year(col(dateCol)).cast("long").as("year"),
                 month(col(dateCol)).cast("long").as("month"))
        .pivot(dayofmonth(col(dateCol)), dayCols)
        .agg(countDistinct(col(idCol))),
      "d")

  /** A7: per-day totals across all datasets (row-sum of the reference's
    * wide matrix, /root/reference/gdutils/__init__.py:154) — in long form
    * just a date groupBy. */
  def dailyTotals(df: DataFrame, dateCol: String, value: Column): DataFrame =
    df.groupBy(to_date(col(dateCol)).as("date")).agg(sum(value).as("total"))

  /** A8: per-year totals. */
  def yearlyTotals(df: DataFrame, dateCol: String, value: Column): DataFrame =
    df.groupBy(year(col(dateCol)).cast("long").as("year")).agg(sum(value).as("total"))

  /** A9: deployments per year — each id counted once per year it was
    * active (/root/reference/gdutils/__init__.py:296). */
  def activePerYear(df: DataFrame, dateCol: String, idCol: String): DataFrame =
    df.groupBy(year(col(dateCol)).cast("long").as("year"))
      .agg(countDistinct(col(idCol)).as("active"))

  /** A12: grand-totals per year: active ids, rows, summed value — three
    * roll-ups in ONE aggregation pass (the reference builds three frames
    * and transposes, /root/reference/gdutils/__init__.py:361-369). */
  def yearlyCounts(df: DataFrame, dateCol: String, idCol: String,
                   value: Column): DataFrame =
    df.groupBy(year(col(dateCol)).cast("long").as("year"))
      .agg(
        countDistinct(col(idCol)).as("deployments"),
        count(lit(1)).as("rows"),
        sum(value).as("total"))

  /** A13: scalar total over a time window slice (P12 + sum). */
  def windowTotal(df: DataFrame, dateCol: String, value: Column,
                  t0: String, t1: String): DataFrame =
    df.where(col(dateCol).between(lit(t0), lit(t1)))
      .agg(sum(value).as("total"))
}
