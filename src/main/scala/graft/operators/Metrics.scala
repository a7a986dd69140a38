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

  /** The (score, n_pos, n_neg) histogram — the MERGEABLE artifact every
    * metric here folds from: counts sum across shards/epochs, so a
    * persisted histogram accumulates a scored STREAM with state bounded
    * by the score grid and grades at any time ([[graft.streaming
    * .StreamMetrics]] is exactly that). ONE map-side-combinable hash
    * aggregate.
    *
    * Scores are REGRIDDED to the 1e-6 grid HERE, which makes the grid
    * bound structural rather than conventional: the downstream
    * single-task folds (the AUC cumulative window, the PR sweep) are
    * provably ≤ 1e6+1 rows for ANY caller passing [0,1] scores — a raw
    * unrounded double score can no longer blow the histogram up to
    * corpus size. Idempotent for already-gridded scores (`round` is a
    * fixpoint on its own output), so pre-rounding callers see identical
    * values. */
  def scoreHistogram(df: DataFrame, scoreCol: Column,
                     labelCol: Column): DataFrame =
    df.select(round(scoreCol, 6).as("score"), labelCol.cast("long").as("_y"))
      .groupBy("score")
      .agg(sum(col("_y")).as("n_pos"), sum(lit(1L) - col("_y")).as("n_neg"))

  /** Merge histogram shards (epochs, partitions): counts just add. */
  def mergeHistograms(hist: DataFrame): DataFrame =
    hist.groupBy("score")
      .agg(sum(col("n_pos")).as("n_pos"), sum(col("n_neg")).as("n_neg"))

  /** One-row frame: (n_pos, n_neg, auc). `labelCol` must be 0/1.
    * AUC is null when either class is empty (undefined, not 0.5). */
  def auc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame =
    aucFromHistogram(scoreHistogram(df, scoreCol, labelCol))

  /** The AUC fold over an existing (score, n_pos, n_neg) histogram —
    * same arithmetic, same one-row output as [[auc]]. */
  def aucFromHistogram(hist: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("score")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val contrib = hist
      .withColumn("_cumneg", coalesce(sum(col("n_neg")).over(w), lit(0L)))
      // 2·contribution stays integral (the n_neg/2 tie term is the only
      // half) and widens to DECIMAL(38,0) before the sum — Σ 2·n_pos·N
      // approaches 2·P·N, past BIGINT once P·N nears 4.6e18 — so the
      // accumulator is EXACT at any corpus size until the one division
      .select((col("n_pos").cast("decimal(38,0)")
          * (lit(2L) * col("_cumneg") + col("n_neg")))
        .as("_c2"), col("n_pos").as("_np"), col("n_neg").as("_nn"))
    contrib.agg(sum(col("_np")).as("n_pos"), sum(col("_nn")).as("n_neg"),
        sum(col("_c2")).as("_s2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("_s2").cast("double")
            / (lit(2.0) * col("n_pos").cast("double")
              * col("n_neg").cast("double")), 6)).as("auc"))
  }

  /** Calibration bins (the reliability diagram): equal-width score bins
    * with each bin's mean predicted score vs observed positive rate —
    * "when the model says 0.8, is it right 80% of the time". ONE hash
    * aggregate over (bin); the mean avoids partition-order float
    * accumulation by re-gridding scores to exact 1e-6 integers
    * (floor(s·1e6 + 0.5), the engine's own rounding discipline) and
    * summing BIGINTs — one division at the end. Output per non-empty
    * bin: (bin, n, n_pos, mean_score, pos_rate, gap). */
  def calibrationBins(df: DataFrame, scoreCol: Column, labelCol: Column,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val b = least(floor(scoreCol * lit(bins)), lit(bins - 1)).cast("long")
    df.select(b.as("bin"),
        floor(scoreCol * lit(1e6) + lit(0.5)).cast("long").as("_s6"),
        labelCol.cast("long").as("_y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("n_pos"),
        sum(col("_s6")).as("_ss"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("_ss").cast("double") / col("n").cast("double")
          / lit(1e6), 6).as("mean_score"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"))
      .withColumn("gap", round(col("pos_rate") - col("mean_score"), 6))
  }

  /** Precision/recall/F1 threshold sweep (the PR curve) — one row per
    * DISTINCT score, treating each as the decision threshold "predict
    * positive iff score ≥ t". Same histogram discipline as [[auc]]: the
    * examples reduce to ONE (score, n_pos, n_neg) map-side-combinable
    * aggregate and every window runs over HISTOGRAM rows (bounded by
    * the score grid — ≤ 1e6+1 rows for 6-decimal scores, never the
    * corpus). TP/FP are cumulative sums down the score-desc order;
    * FN = P − TP. All counts exact BIGINTs; precision = TP/(TP+FP)
    * (denominator ≥ 1 by construction — the threshold row itself is
    * counted), and F1 uses the integer form 2·TP/(2·TP+FP+FN) so it
    * never composes two already-rounded doubles. recall/F1 are null
    * when the corpus has no positives (undefined, not 0); fpr = FP/N
    * rides along so the same sweep also plots the ROC (tpr == recall),
    * null when there are no negatives. */
  def prCurve(df: DataFrame, scoreCol: Column, labelCol: Column)
      : DataFrame = {
    val hist = df
      // same structural 1e-6 regrid as [[scoreHistogram]]: the desc
      // window below is then bounded by the grid for any caller
      .select(round(scoreCol, 6).as("threshold"),
        labelCol.cast("long").as("_y"))
      .groupBy("threshold")
      .agg(sum(col("_y")).as("_np"), sum(lit(1L) - col("_y")).as("_nn"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("threshold").desc)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    hist
      .withColumn("tp", sum(col("_np")).over(wDesc))
      .withColumn("fp", sum(col("_nn")).over(wDesc))
      .withColumn("_p", sum(col("_np")).over(wAll))
      .withColumn("_n", sum(col("_nn")).over(wAll))
      .select(col("threshold"), col("tp"), col("fp"),
        (col("_p") - col("tp")).as("fn"),
        round(col("tp").cast("double")
          / (col("tp") + col("fp")).cast("double"), 6).as("precision"),
        when(col("_p") > 0,
          round(col("tp").cast("double") / col("_p").cast("double"), 6))
          .as("recall"),
        when(col("_n") > 0,
          round(col("fp").cast("double") / col("_n").cast("double"), 6))
          .as("fpr"),
        when(col("_p") > 0,
          round((lit(2L) * col("tp")).cast("double")
            / (lit(2L) * col("tp") + col("fp")
              + (col("_p") - col("tp"))).cast("double"), 6)).as("f1"))
  }

  /** [[calibrationBins]] folded from an existing (score, n_pos, n_neg)
    * histogram instead of examples — identical output by construction:
    * the bin aggregate's per-example terms (count, label, 1e-6-regridded
    * score) are each constant within a histogram row, so summing
    * count-weighted histogram rows reproduces the example sums exactly
    * (spec-pinned equal). */
  def calibrationFromHistogram(hist: DataFrame, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val b = least(floor(col("score") * lit(bins)), lit(bins - 1)).cast("long")
    val n = col("n_pos") + col("n_neg")
    hist.select(b.as("bin"), n.as("_n"), col("n_pos").as("_npos"),
        (n * floor(col("score") * lit(1e6) + lit(0.5)).cast("long")).as("_s6"))
      .groupBy("bin")
      .agg(sum(col("_n")).as("n"), sum(col("_npos")).as("n_pos"),
        sum(col("_s6")).as("_ss"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("_ss").cast("double") / col("n").cast("double")
          / lit(1e6), 6).as("mean_score"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"))
      .withColumn("gap", round(col("pos_rate") - col("mean_score"), 6))
  }

  /** Expected / max calibration error — the one-row summary of
    * [[calibrationBins]]: ECE = Σ_b (n_b/N)·|gap_b|, MCE = max_b
    * |gap_b|. The per-bin gaps are already on the exact 1e-6 grid, so
    * they re-grid to BIGINTs (floor(|gap|·1e6 + 0.5)) and the weighted
    * sum stays exact until ONE final division — no partition-order
    * float accumulation over the ≤`bins` rows. Output: (n, ece, mce). */
  def ece(df: DataFrame, scoreCol: Column, labelCol: Column,
          bins: Int = 10): DataFrame =
    eceFold(calibrationBins(df, scoreCol, labelCol, bins))

  /** [[ece]] folded from an existing (score, n_pos, n_neg) histogram. */
  def eceFromHistogram(hist: DataFrame, bins: Int = 10): DataFrame =
    eceFold(calibrationFromHistogram(hist, bins))

  private def eceFold(binsDf: DataFrame): DataFrame =
    binsDf
      .select(col("n"),
        floor(abs(col("gap")) * lit(1e6) + lit(0.5)).cast("long")
          .as("_g6"))
      .agg(sum(col("n")).as("n"),
        // n·g6 reaches N·1e6 per bin — widen past BIGINT before summing
        sum(col("n").cast("decimal(38,0)") * col("_g6")).as("_num"),
        max(col("_g6")).as("_mx"))
      .select(col("n"),
        round(col("_num").cast("double") / col("n").cast("double")
          / lit(1e6), 6).as("ece"),
        round(col("_mx").cast("double") / lit(1e6), 6).as("mce"))

  /** Brier score — the PROPER scoring rule mean (p − y)², completing
    * the grade family (AUC ranks, ECE calibrates, Brier scores): exact
    * arithmetic by re-gridding p to 1e-6 integers so each term
    * (p6 − y·1e6)² is an exact BIGINT and the sum is order-free; ONE
    * aggregate, one final division. Output one row: (n, brier). */
  def brier(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame =
    df.select(floor(scoreCol * lit(1e6) + lit(0.5)).cast("long").as("_p6"),
        (labelCol.cast("long") * lit(1000000L)).as("_y6"))
      .agg(count(lit(1)).as("n"),
        // each (p6−y6)² term is ≤ 1e12, so a BIGINT sum overflows near
        // 1e7 examples (ANSI throw / silent wrap) while the oracle's
        // HUGEINT keeps going — widen to DECIMAL(38,0) so both engines
        // stay exact to ~1e26 examples (the Funnel _sumus discipline)
        sum(((col("_p6") - col("_y6")) * (col("_p6") - col("_y6")))
          .cast("decimal(38,0)")).as("_s2"))
      .select(col("n"),
        round(col("_s2").cast("double") / col("n").cast("double")
          / lit(1e12), 6).as("brier"))

  /** [[brier]] from an existing (score, n_pos, n_neg) histogram —
    * per score the positives contribute (p6 − 1e6)² each and the
    * negatives p6² each, so the example sum reproduces exactly. */
  def brierFromHistogram(hist: DataFrame): DataFrame = {
    val p6 = floor(col("score") * lit(1e6) + lit(0.5)).cast("long")
    hist.select((col("n_pos") + col("n_neg")).as("_n"),
        // per-row term is (≤1e12)·count — widen BEFORE the count factor
        // so neither the product nor the sum can pass BIGINT
        (((p6 - lit(1000000L)) * (p6 - lit(1000000L))).cast("decimal(38,0)")
            * col("n_pos")
          + (p6 * p6).cast("decimal(38,0)") * col("n_neg")).as("_s2"))
      .agg(sum(col("_n")).as("n"), sum(col("_s2")).as("_s2"))
      .select(col("n"),
        round(col("_s2").cast("double") / col("n").cast("double")
          / lit(1e12), 6).as("brier"))
  }

  /** Population stability index — score-distribution DRIFT between a
    * REFERENCE and a CURRENT scored population: PSI = Σ_b (p_b − q_b)·
    * ln(p_b/q_b) over equal-width score bins (the standard model-
    * monitoring thresholds: < 0.1 stable, > 0.25 action). Bin shares
    * are Laplace-smoothed ((c+1)/(N+bins)) so empty bins stay defined
    * without a special case — deterministic, oracle-replayable, and
    * symmetric-in-spirit with the KL discipline: each term is ONE fixed
    * double op order, rounded onto the 1e-6 grid and summed as DECIMAL
    * (order-free), one final round. Output one row: (n_ref, n_cur, psi).
    *
    * Scale shape: one bounded (≤ bins-row) fold past the two histogram
    * aggregates; with persisted [[scoreHistogram]] stores (the
    * [[graft.streaming.StreamMetrics]] artifact) drift against a frozen
    * baseline needs NO example re-scan — that is what
    * [[psiFromHistograms]] is for. */
  def psi(ref: DataFrame, cur: DataFrame, refScore: Column,
          curScore: Column, bins: Int = 10): DataFrame =
    psiFromHistograms(
      scoreHistogram(ref, refScore, lit(0L)),
      scoreHistogram(cur, curScore, lit(0L)), bins)

  /** [[psi]] from two existing (score, n_pos, n_neg) histograms —
    * labels are ignored (drift is about the score distribution). */
  def psiFromHistograms(refHist: DataFrame, curHist: DataFrame,
                        bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    def binCounts(h: DataFrame): DataFrame =
      h.select(least(floor(col("score") * lit(bins)), lit(bins - 1))
          .cast("long").as("bin"),
          (col("n_pos") + col("n_neg")).as("_c"))
        .groupBy("bin").agg(sum(col("_c")).as("_c"))
    val j = binCounts(refHist).select(col("bin"), col("_c").as("_cr"))
      .join(binCounts(curHist).select(col("bin"), col("_c").as("_cc")),
        Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("_cr"), lit(0L)).as("_cr"),
        coalesce(col("_cc"), lit(0L)).as("_cc"))
    val tot = j.agg(sum(col("_cr")).as("_nr"), sum(col("_cc")).as("_nc"))
    val p = (col("_cr") + lit(1L)).cast("double") /
      (col("_nr") + lit(bins.toLong)).cast("double")
    val q = (col("_cc") + lit(1L)).cast("double") /
      (col("_nc") + lit(bins.toLong)).cast("double")
    // fold the terms WITHOUT a groupBy (a groupBy over zero joined rows
    // emits zero rows) so the output is exactly one row even when both
    // histograms are empty — there PSI is 0 by the smoothing's own
    // definition (every bin has p = q = 1/bins)
    val folded = j.crossJoin(broadcast(tot))
      .select(round((p - q) * log(p / q), 6).cast("decimal(28,6)").as("_t"))
      .agg(coalesce(round(sum(col("_t")).cast("double"), 6), lit(0.0))
        .as("psi"))
    tot.crossJoin(broadcast(folded))
      .select(coalesce(col("_nr"), lit(0L)).as("n_ref"),
        coalesce(col("_nc"), lit(0L)).as("n_cur"), col("psi"))
  }

  /** Cohen's kappa — chance-corrected inter-annotator agreement, the
    * label-QA gate before human labels feed training: κ = (p_o − p_e) /
    * (1 − p_e) with p_o the observed agreement and p_e the chance
    * agreement Σ_c p_a(c)·p_b(c). One (a, b) contingency aggregate
    * (rows bounded by label-pair cardinality, map-side combinable);
    * marginals re-aggregate the contingency frame, never the examples;
    * counts stay exact BIGINTs — p_o, p_e, and κ are each ONE fixed
    * division order so the oracle replays the doubles. Output one row:
    * (n, po, pe, kappa); κ is null when p_e = 1 (a single shared label
    * — agreement is undefined, not perfect). */
  def cohenKappa(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val ct = df.select(aCol.cast("string").as("_a"),
        bCol.cast("string").as("_b"))
      .groupBy("_a", "_b").agg(count(lit(1)).as("_c"))
    val ma = ct.groupBy("_a").agg(sum(col("_c")).as("_ca"))
    val mb = ct.groupBy("_b").agg(sum(col("_c")).as("_cb"))
    // Σ_c ca(c)·cb(c) over the classes BOTH raters used (absent side = 0);
    // each product nears n² — widen past BIGINT (overflow at ~3e9 rows)
    val cross = ma.join(mb, col("_a") === col("_b"))
      .agg(coalesce(sum(col("_ca").cast("decimal(38,0)") * col("_cb")),
        lit(0L).cast("decimal(38,0)")).as("_x"))
    val agree = ct.agg(sum(col("_c")).as("n"),
      coalesce(sum(when(col("_a") === col("_b"), col("_c"))), lit(0L))
        .as("_ag"))
    agree.crossJoin(broadcast(cross))
      .select(col("n"),
        round(col("_ag").cast("double") / col("n").cast("double"), 6)
          .as("po"),
        round(col("_x").cast("double")
          / (col("n").cast("double") * col("n").cast("double")), 6)
          .as("pe"))
      .select(col("n"), col("po"), col("pe"),
        when(col("pe") < 1.0,
          round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 6))
          .as("kappa"))
  }
}
