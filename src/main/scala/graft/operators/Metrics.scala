package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation metrics for in-engine models (the X84 classifier, the
  * frozen LM scorers) computed at corpus scale — the piece that closes
  * the train → score → GRADE loop without collecting scores.
  *
  * The AUC here is the histogram form of the rank-sum (Mann–Whitney)
  * statistic: scores reduce to a (score, n_pos, n_neg) histogram — ONE
  * map-side-combinable aggregate — and the only window runs over
  * HISTOGRAM rows ordered by score (bounded by distinct scores, which
  * for grid-rounded engine scores is small by construction), never over
  * examples. Ties contribute half (the standard trapezoid/averaged-rank
  * treatment): AUC = Σ_s n_pos(s)·(cumNeg(<s) + n_neg(s)/2) / (P·N).
  * All counts are exact BIGINTs; the final expression is one fixed
  * division order, so a SQL oracle replays the double exactly. */
object Metrics {

  /** One-row frame: (n_pos, n_neg, auc). `labelCol` must be 0/1.
    * AUC is null when either class is empty (undefined, not 0.5). */
  def auc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val hist = df
      .select(scoreCol.as("_s"), labelCol.cast("long").as("_y"))
      .groupBy("_s")
      .agg(sum(col("_y")).as("_np"),
        sum(lit(1L) - col("_y")).as("_nn"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("_s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val contrib = hist
      .withColumn("_cumneg", coalesce(sum(col("_nn")).over(w), lit(0L)))
      // 2·contribution stays integral (the n_neg/2 tie term is the only
      // half), so the sum is an EXACT BIGINT until the single division
      .select((col("_np") * (lit(2L) * col("_cumneg") + col("_nn")))
        .as("_c2"), col("_np"), col("_nn"))
    contrib.agg(sum(col("_np")).as("n_pos"), sum(col("_nn")).as("n_neg"),
        sum(col("_c2")).as("_s2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("_s2").cast("double")
            / (lit(2.0) * col("n_pos").cast("double")
              * col("n_neg").cast("double")), 6)).as("auc"))
  }
}
