package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the long-form events table: ordered
  * conversion funnels and cohort retention — the product-analytics pair
  * every eventing warehouse query pack needs (the reference's "status"
  * reports are the degenerate 1-step case of these).
  *
  * Both operators are built from hash aggregates and keyed equi-joins
  * only — no windows over the event stream, no per-user sort, no driver
  * actions — so they run as a handful of shuffles regardless of event
  * volume.
  */
object Funnel {

  /** Per-user step-completion rows: (user, step, event_type, t) — one
    * row per step the user REACHED under the strict ordering (t = the
    * earliest qualifying event time). The detail form [[funnel]]
    * summarizes, and the row set `streaming.StreamFunnel` reproduces
    * live (spec-gated stream == batch). Same k−1 keyed-join shape. */
  /** The step-completion frames, one per step, each carrying the
    * user's completion time `_t` AND the previous step's completion
    * `_pt` (null at step 0) — `_pt` is free: the keyed join that
    * qualifies step k's events already carries step k−1's single
    * completion row per user, so aggregating `min(_t_prev)` alongside
    * `min(_ts)` costs nothing and saves [[transitionStats]] a second
    * full pass over the chain. */
  private def stepFrames(events: DataFrame, userCol: String, tsCol: String,
                         typeCol: String, steps: Seq[String],
                         maxGaps: Seq[Option[String]]): Seq[DataFrame] = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps: $steps")
    require(steps.distinct == steps, s"funnel steps must be distinct: $steps")
    require(maxGaps.isEmpty || maxGaps.size == steps.size - 1,
      s"maxGaps needs one entry per transition (${steps.size - 1}): $maxGaps")
    val gaps: Seq[Option[String]] =
      if (maxGaps.isEmpty) Seq.fill(steps.size - 1)(None) else maxGaps
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("_u")).agg(min(col(tsCol)).as("_t"))
      .withColumn("_pt", lit(null).cast(org.apache.spark.sql.types.TimestampType))
    steps.tail.zip(gaps).scanLeft(first) {
      case (prev, (st, gap)) =>
        val joined = events.where(col(typeCol) === st)
          .select(col(userCol).as("_u"), col(tsCol).as("_ts"))
          .join(prev.select(col("_u"), col("_t")), Seq("_u"))
          .where(col("_ts") > col("_t"))
        // per-transition window ("click within 7 days of the view"): the
        // qualifying range becomes (t, t + gap] — one extra pushed
        // predicate on the SAME keyed join, no new shuffle
        gap.fold(joined)(g =>
            joined.where(col("_ts") <= col("_t") + expr(s"INTERVAL $g")))
          // prev's _t is one row per user, so min() is just "carry it"
          .groupBy("_u").agg(min(col("_ts")).as("_t"),
            min(col("_t")).as("_pt"))
    }
  }

  def userSteps(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, steps: Seq[String],
                maxGaps: Seq[Option[String]] = Nil): DataFrame = {
    val frames = stepFrames(events, userCol, tsCol, typeCol, steps, maxGaps)
    steps.zip(frames).zipWithIndex.map { case ((st, f), i) =>
      f.select(col("_u").as(userCol), lit(i).cast("long").as("step"),
        lit(st).as("event_type"), col("_t").as("t"))
    }.reduce(_ union _)
  }

  /** Ordered conversion funnel: for `steps = Seq(s0, s1, s2, …)`, a user
    * "reaches" step i when they have an s_i event STRICTLY after their
    * step-(i−1) completion time (earliest such event counts; step 0 is
    * the user's earliest s0 event). Output, one row per step:
    * (step, event_type, users, conv_prev, conv_first) — conversion vs
    * the previous step (1.0 at step 0) and vs the funnel entry.
    *
    * Scale shape: each step is ONE filtered event scan (the type
    * predicate pushes into the source) equi-joined on the user key to
    * the previous step's (user, t) frame, reduced by a
    * map-side-combinable min — k−1 keyed shuffles for a k-step funnel,
    * no window, no per-user event list. The step summaries are k
    * single-row aggregates unioned driver-side (plan-side, not action
    * side); conversion rates join on the k-row summary itself. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             maxGaps: Seq[Option[String]] = Nil): DataFrame = {
    val stepRows = userSteps(events, userCol, tsCol, typeCol, steps, maxGaps)
    val counts = stepRows.groupBy("step", "event_type")
      .agg(count(lit(1)).as("users"))
    // absent steps (nobody reached) must still row out with users = 0
    val all = steps.zipWithIndex.map { case (st, i) =>
      counts.sparkSession.range(1)
        .select(lit(i.toLong).as("step"), lit(st).as("event_type"))
    }.reduce(_ union _)
    val summaries = all.join(counts, Seq("step", "event_type"), "left")
      .select(col("step"), col("event_type"),
        coalesce(col("users"), lit(0L)).as("users"))
    val entry = summaries.where(col("step") === 0)
      .select(col("users").as("_u0"))
    val prevUsers = summaries
      .select((col("step") + 1).as("step"), col("users").as("_uprev"))
    // dead steps make zero divisors (ANSI mode throws on /0): step 0's
    // missing predecessor reads 1.0, a zero predecessor reads null —
    // "conversion from nobody" is undefined, not infinite
    summaries.join(prevUsers, Seq("step"), "left")
      .crossJoin(broadcast(entry))
      .select(col("step"), col("event_type"), col("users"),
        when(col("_uprev").isNull, lit(1.0))
          .when(col("_uprev") > 0,
            round(col("users").cast("double") / col("_uprev").cast("double"), 6))
          .as("conv_prev"),
        when(col("_u0") > 0,
          round(col("users").cast("double") / col("_u0").cast("double"), 6))
          .as("conv_first"))
  }

  /** Cohort retention: users are cohorted by their FIRST active day;
    * each (cohort day, day_offset) cell counts the cohort's users active
    * on cohort+offset. Output: (cohort, day_offset, cohort_size,
    * active_users, retention) — day_offset 0 is the cohort day itself
    * (retention 1.0 by construction).
    *
    * Scale shape: first-seen is one hash aggregate; (user, day) actives
    * are one distinct (both map-side combinable); the cell count joins
    * actives to cohorts on the user key and re-aggregates — three
    * shuffles total, state bounded by users + cells, never by events.
    * For billion-user tables use [[cohortRetentionApprox]] — HLL
    * registers per cell, identical join shape. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      maxOffsetDays: Int = 30): DataFrame = {
    require(maxOffsetDays >= 0, s"maxOffsetDays: $maxOffsetDays")
    val firstSeen = events.groupBy(col(userCol).as("_u"))
      .agg(min(to_date(col(tsCol))).as("cohort"))
    val active = events
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("_d"))
      .distinct()
    val cells = active.join(firstSeen, Seq("_u"))
      .select(col("cohort"), datediff(col("_d"), col("cohort")).as("day_offset"))
      .where(col("day_offset") <= maxOffsetDays)
      .groupBy("cohort", "day_offset")
      .agg(count(lit(1)).as("active_users")) // (_u, _d) distinct upstream
    val sizes = firstSeen.groupBy("cohort")
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(sizes, Seq("cohort"))
      .select(col("cohort"), col("day_offset").cast("long").as("day_offset"),
        col("cohort_size"), col("active_users"),
        round(col("active_users").cast("double")
          / col("cohort_size").cast("double"), 6).as("retention"))
  }

  /** Per-transition latency ("time to convert"): for each funnel step
    * k ≥ 1, how long converting users took from their step-(k−1)
    * completion to their step-k completion. Output, one row per
    * transition that at least one user made: (step, event_type, users,
    * median_gap_s, p90_gap_s, mean_gap_s).
    *
    * Determinism/scale contract (the X57 percentile-gate discipline):
    * gaps are gridded to integer SECONDS (floor of the exact µs delta),
    * and the median/p90 are order statistics over the per-transition
    * (second, count) HISTOGRAM — the only window runs over histogram
    * rows (≤ distinct gap-seconds, bounded by the funnel's time span),
    * never over events or users. The lower-median convention (smallest
    * second with cumulative count ≥ (n+1) div 2; p90 likewise at
    * ceil(0.9·n)) is pure integer arithmetic, so a SQL oracle replays
    * it exactly. The mean divides one exact DECIMAL µs sum once —
    * no partition-order float accumulation. */
  def transitionStats(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, steps: Seq[String],
                      maxGaps: Seq[Option[String]] = Nil): DataFrame = {
    // each step-k frame already carries the user's step-(k−1) completion
    // (_pt), so the gaps come straight off the chain — no self-join, no
    // second pass over the k keyed shuffles
    val frames = stepFrames(events, userCol, tsCol, typeCol, steps, maxGaps)
    val dt = steps.zip(frames).zipWithIndex.tail.map { case ((st, f), i) =>
      f.select(lit(i.toLong).as("step"), lit(st).as("event_type"),
        (Sessions.epochUs(col("_t")) - Sessions.epochUs(col("_pt")))
          .as("_dtus"))
    }.reduce(_ union _)
    val hist = dt
      .groupBy(col("step"), col("event_type"),
        expr("_dtus div 1000000").as("_s"))
      .agg(count(lit(1)).as("_c"),
        sum(col("_dtus").cast("decimal(38,0)")).as("_sumus"))
    val tot = hist.groupBy("step", "event_type")
      .agg(sum(col("_c")).as("_n"), sum(col("_sumus")).as("_sum_us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("step").orderBy("_s")
    val cum = hist.select(col("step"), col("_s"), col("_c"))
      .withColumn("_cum", sum(col("_c")).over(w))
    val med = cum.join(tot.select(col("step"), col("_n")), Seq("step"))
      .where(col("_cum") >= expr("(_n + 1) div 2"))
      .groupBy("step").agg(min(col("_s")).as("median_gap_s"))
    val p90 = cum.join(tot.select(col("step"), col("_n")), Seq("step"))
      .where(col("_cum") >= expr("(9 * _n + 9) div 10"))
      .groupBy("step").agg(min(col("_s")).as("p90_gap_s"))
    tot.join(med, Seq("step")).join(p90, Seq("step"))
      .select(col("step"), col("event_type"), col("_n").as("users"),
        col("median_gap_s"), col("p90_gap_s"),
        round(col("_sum_us").cast("double") / col("_n").cast("double")
          / lit(1000000.0), 6).as("mean_gap_s"))
  }

  /** The billion-user form of [[cohortRetention]]: per-cell actives via
    * HLL registers (`Hll.groupedDistinctEstimate`) instead of an exact
    * distinct — the join shape is unchanged, per-cell state drops from
    * |users| to 2^p bytes, and the estimate error (~1.04/√2^p) is the
    * price. Cohort sizes stay exact (one row per user exists already).
    * Output matches [[cohortRetention]] with active_users/retention
    * carrying the estimate (spec-gated against the exact form). */
  def cohortRetentionApprox(events: DataFrame, userCol: String,
                            tsCol: String, p: Int = 12,
                            maxOffsetDays: Int = 30): DataFrame = {
    require(maxOffsetDays >= 0, s"maxOffsetDays: $maxOffsetDays")
    val firstSeen = events.groupBy(col(userCol).as("_u"))
      .agg(min(to_date(col(tsCol))).as("cohort"))
    val active = events
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("_d"))
      .distinct()
    val cellRows = active.join(firstSeen, Seq("_u"))
      .select(col("cohort"), datediff(col("_d"), col("cohort")).as("day_offset"),
        col("_u"))
      .where(col("day_offset") <= maxOffsetDays)
    val cells = graft.functions.Hll.groupedDistinctEstimate(cellRows,
        Seq("cohort", "day_offset"),
        Sampling.hash60(col("_u").cast("string")), p, exactGauge = false)
      .select(col("cohort"), col("day_offset"), col("estimate"))
    val sizes = firstSeen.groupBy("cohort")
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(sizes, Seq("cohort"))
      .select(col("cohort"), col("day_offset").cast("long").as("day_offset"),
        col("cohort_size"), col("estimate").as("active_users"),
        round(col("estimate") / col("cohort_size").cast("double"), 6)
          .as("retention"))
  }
}
