package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed time-series anomaly detection — the monitoring pass a
  * training-data pipeline runs over its ingest/event streams (spot a
  * user/source whose metric suddenly leaves its own recent band) and the
  * classic per-entity outlier gate over telemetry tables.
  *
  * [[rollingZScore]] scores every event against the PRECEDING `lookback`
  * events of the same key: z = (v − mean_prev) / std_prev, flagged when
  * |z| > `zThreshold` and at least `minPoints` history rows exist. The
  * current row is excluded from its own baseline (a level shift scores
  * against the pre-shift window — the standard trailing-baseline form).
  *
  * Cross-engine determinism (this op is fully oracled): the window mean
  * and variance come from EXACT decimal sums — `value` doubles sit on
  * the 2-dp grid (see [[Parity]]), so Σv over DECIMAL(12,2) and Σv² over
  * its DECIMAL(25,4) square are order-free integers-in-disguise; the
  * float work (mean, variance, z) happens AFTER, in one fixed op order
  * both engines replay. A plain double window sum would drift a last
  * ulp between Spark's buffer replay and DuckDB's segment tree.
  * Variance is clamped at 0 (catastrophic cancellation on a constant
  * window can land at −1e-16) and a zero-variance baseline yields a
  * null z (never ±Infinity), unflagged.
  *
  * Scale shape: ONE window keyed by the entity — state per task ∝ that
  * key's events (entity histories are the natural partition; a hot key
  * is bounded by its own event count, not the corpus). No global
  * window, no self-join, nothing quadratic; the z arithmetic fuses into
  * the window projection map-side. */
object Anomaly {

  def rollingZScore(df: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, valueCol: String, lookback: Int = 20,
                    minPoints: Int = 5, zThreshold: Double = 3.0): DataFrame = {
    require(lookback >= 1, s"lookback must be >= 1: $lookback")
    require(minPoints >= 2, s"minPoints must be >= 2: $minPoints")
    require(zThreshold > 0, s"zThreshold must be positive: $zThreshold")
    val fr = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(-lookback, -1)
    val dec: Column = col(valueCol).cast("decimal(12,2)")
    val v = df
      .withColumn("n_prev", count(lit(1)).over(fr))
      .withColumn("_sv", sum(dec).over(fr).cast("double"))
      .withColumn("_sq", sum(dec * dec).over(fr).cast("double"))
      .withColumn("_mean",
        when(col("n_prev") > 0, col("_sv") / col("n_prev")))
      .withColumn("_var",
        when(col("n_prev") > 0, greatest(
          col("_sq") / col("n_prev") -
            (col("_sv") / col("n_prev")) * (col("_sv") / col("n_prev")),
          lit(0.0d))))
      .withColumn("_z",
        when(col("n_prev") >= minPoints && col("_var") > 0,
          (col(valueCol) - col("_mean")) / sqrt(col("_var"))))
    v.select(col(idCol), col(keyCol), col(tsCol), col(valueCol),
      col("n_prev"),
      round(col("_mean"), 6).as("mean_prev"),
      round(col("_z"), 6).as("z"),
      coalesce(abs(col("_z")) > zThreshold, lit(false)).as("anomaly"))
  }

  /** Robust (median/MAD) outlier score per key — the Iglewicz–Hoaglin
    * modified z-score M = 0.6745·(x − median)/MAD, the mean/std
    * replacement that one fat-tailed burst cannot drag (a single 100×
    * spike shifts a mean-based baseline but moves the median not at
    * all). Global per-key baselines (the batch profile pass; see
    * [[rollingZScore]] for the trailing-window form). Flags |M| >
    * `threshold` (3.5 is the published default); a zero MAD
    * (constant-majority key) yields null score and null flag, never
    * ±Inf.
    *
    * Oracle discipline: median and MAD are the proven
    * percentile↔quantile_cont pair, each rounded onto the 1e-6 grid
    * before reuse; the score is one fixed-order float expression. Two
    * percentile aggregates + two broadcastable per-key joins — the
    * corpus is never windowed or sorted.
    *
    * Output: (id, key, value, med, mad, z, is_outlier 0/1, null when
    * MAD = 0). */
  def robustZScore(events: DataFrame, idCol: String, keyCol: String,
                   valueCol: String, threshold: Double = 3.5): DataFrame =
    robustZScoreAgainst(events, idCol, keyCol, valueCol,
      robustBaselines(events, keyCol, valueCol), threshold)

  /** Per-key (median, MAD) baseline table — the FROZEN artifact for
    * [[robustZScoreAgainst]]: profile the reference window in batch,
    * persist (key, med, mad), serve indefinitely. Two percentile
    * aggregates, output ∝ keys. */
  def robustBaselines(events: DataFrame, keyCol: String,
                      valueCol: String): DataFrame = {
    val med = events.groupBy(col(keyCol))
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 6).as("med"))
    events.join(broadcast(med), Seq(keyCol))
      .withColumn("_dev", abs(col(valueCol) - col("med")))
      .groupBy(col(keyCol), col("med"))
      .agg(round(expr("percentile(_dev, 0.5)"), 6).as("mad"))
      .select(col(keyCol), col("med"), col("mad"))
  }

  /** Score events against a FROZEN (key, med, mad) baseline — one
    * broadcast join + a map-side formula, so it runs unchanged on a
    * STREAM (stateless: no aggregation, verdicts idempotent under
    * replay — the StreamCurate discipline; spec-gated stream == batch).
    * Events with no baseline row pass through with null score/flag
    * (an unseen key is not an anomaly, it's an unprofiled one). */
  def robustZScoreAgainst(events: DataFrame, idCol: String, keyCol: String,
                          valueCol: String, baselines: DataFrame,
                          threshold: Double = 3.5): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val zRaw = lit(0.6745) * (col(valueCol) - col("med")) / col("mad")
    events.join(broadcast(baselines), Seq(keyCol), "left")
      .select(col(idCol), col(keyCol), col(valueCol),
        col("med"), col("mad"),
        when(col("mad") > 0, round(zRaw, 6)).as("z"),
        when(col("mad") > 0, (abs(zRaw) > threshold).cast("long"))
          .as("is_outlier"))
  }
}
