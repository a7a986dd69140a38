package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.udaf

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) over
  * pre-hashed keys — the third bounded-state sketch next to [[Bloom]]
  * (membership) and [[CountMin]] (frequency): cardinality in 2^p bytes
  * of state regardless of key count, mergeable by element-wise max, so
  * partial aggregation combines map-side and the shuffle carries one
  * m-byte register array per partition — the only way "distinct users
  * per day for a year" fits one pass at 100 TB (an exact
  * countDistinct keeps per-key state; approx_count_distinct exists in
  * Spark but its HLL++ registers are neither portable nor
  * oracle-replayable).
  *
  * Hash discipline: input is the 60-bit md5-derived
  * `Sampling.hash60` value (the engine-portable stand-in for xxhash64
  * used everywhere a hash VALUE must replay in DuckDB). The top `p`
  * bits pick a register, the remaining w = 60−p bits feed the
  * rank-of-first-one: rho = w − floor(log2(rem)) for rem > 0 (i.e.
  * leading zeros within the w-bit window + 1), rho = w + 1 for rem = 0.
  * floor(log2) is integer-exact in ANY engine as `length(bin(rem)) − 1`
  * — no floating point until the final harmonic mean.
  *
  * Estimate: alpha_m·m²/Z with Z = Σ 2^−M_j, plus the standard
  * small-range correction E ≤ 2.5m ∧ V>0 → m·ln(m/V) (V = zero
  * registers). Each 2^−M_j is an exact dyadic double; [[estimate]] sums
  * the NONZERO registers in ascending register order and adds the V
  * zero-register ones (2^0 = 1 each) as one final `+ V` — the same
  * fold order the declarative twin and its DuckDB oracle use, so all
  * three paths produce the identical double.
  */
object Hll {

  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  private[graft] def registerOf(h: Long, p: Int): (Int, Int) = {
    val w = 60 - p
    val idx = (h >>> w).toInt
    val rem = h & ((1L << w) - 1)
    val rho = if (rem == 0L) w + 1
      else w - (63 - java.lang.Long.numberOfLeadingZeros(rem))
    (idx, rho)
  }

  /** Typed Aggregator: input = hash60(key), buffer/output = 2^p register
    * bytes (max rho per register; rho ≤ 61 fits a byte at any p). */
  class SketchAgg(p: Int) extends Aggregator[Long, Array[Byte], Array[Byte]] {
    require(p >= 4 && p <= 18, s"p must be in [4, 18]: $p")
    private val m = 1 << p
    override def zero: Array[Byte] = new Array[Byte](m)
    override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
      val (idx, rho) = registerOf(h, p)
      if (rho > b(idx)) b(idx) = rho.toByte
      b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]()
    override def outputEncoder: Encoder[Array[Byte]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]()
  }

  /** Aggregate column: `sketch(p)(hash60-column)` → 2^p register bytes.
    * Mergeable state — works in batch rollups and streaming aggregates
    * alike (the registers themselves union by max). */
  def sketch(p: Int)(hashed: Column): Column =
    udaf(new SketchAgg(p)).apply(hashed)

  /** Cardinality estimate from collected registers — nonzero registers
    * summed ascending-index, zeros folded in as one `+ V` (the fold
    * order contract shared with [[distinctEstimate]] and its oracle). */
  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    var z = 0.0
    var v = 0
    var i = 0
    while (i < m) {
      if (regs(i) == 0) v += 1
      else z += java.lang.Math.pow(2.0, -regs(i).toDouble)
      i += 1
    }
    z += v.toDouble
    val e = alpha(m) * m.toDouble * m.toDouble / z
    if (e <= 2.5 * m && v > 0) m.toDouble * math.log(m.toDouble / v) else e
  }

  /** Union estimate of two register arrays — element-wise max is the
    * sketch's NATIVE merge, so the union estimate carries the same
    * ~1.04/√m error as a single sketch (this is why HLL registers, not
    * counts, are the artifact worth persisting per segment: any ad-hoc
    * segment union is a max + estimate, no re-scan). */
  def unionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length,
      s"register arrays differ: ${a.length} vs ${b.length}")
    val u = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) { u(i) = if (a(i) >= b(i)) a(i) else b(i); i += 1 }
    estimate(u)
  }

  /** Intersection estimate by inclusion–exclusion |A|+|B|−|A∪B| — the
    * standard HLL derivation, with the standard caveat: the error is
    * relative to the UNION size, so small intersections of large sets
    * are noisy (can even go negative — clamped at 0 here; use a
    * theta/minhash sketch when intersections are the primary query). */
  def intersectionEstimate(a: Array[Byte], b: Array[Byte]): Double =
    math.max(estimate(a) + estimate(b) - unionEstimate(a, b), 0.0)

  /** Declarative twin of sketch+estimate — the oracle-replayable path:
    * registers as a (bucket, max rho) groupBy, the harmonic sum as an
    * ascending-bucket list fold (exact-dyadic terms, deterministic
    * order on every engine), zeros as `m − present`. ONE output row:
    * (m, n_exact, v_zero, est_raw, estimate). n_exact rides along so
    * the sketch's error is part of the gated result, not a claim.
    *
    * Scale shape: two hash aggregates (the (bucket, rho) reduction is
    * map-side combinable and ≤ m rows survive) + one m-row fold —
    * the exact-count column is the only per-key-state pass and exists
    * for the oracle comparison, not the sketch. */
  def distinctEstimate(df: DataFrame, hashed: Column, p: Int): DataFrame = {
    require(p >= 4 && p <= 18, s"p must be in [4, 18]: $p")
    val m = 1 << p
    val keys = df.select(hashed.as("_h"))
    val folded = zvFold(regRows(keys, Nil, p), Nil, m)
    val exact = keys.agg(countDistinct(col("_h")).as("n_exact"))
    folded.crossJoin(exact)
      .select(Seq(lit(m).cast("long").as("m"), col("n_exact")) ++
        estimateCols(m): _*)
  }

  /** Per-group declarative HLL — the rollup form ("distinct users per
    * (key, day)" over unbounded keys): same register/fold/branch
    * contract as [[distinctEstimate]], grouped. Output: groupCols ++
    * (n_exact, v_zero, est_raw, estimate). The registers aggregate is
    * map-side combinable with ≤ m rows per group surviving; only the
    * n_exact gauge keeps per-key state (drop it at true scale — it
    * exists so the sketch's error is graded, not claimed). */
  def groupedDistinctEstimate(df: DataFrame, groupCols: Seq[String],
                              hashed: Column, p: Int,
                              exactGauge: Boolean = true): DataFrame = {
    require(p >= 4 && p <= 18, s"p must be in [4, 18]: $p")
    require(groupCols.nonEmpty, "groupCols must be non-empty (else use " +
      "distinctEstimate)")
    val m = 1 << p
    val keys = df.select(groupCols.map(col) :+ hashed.as("_h"): _*)
    val folded = zvFold(regRows(keys, groupCols, p), groupCols, m)
    if (exactGauge) {
      // the error-grading gauge — the ONLY per-key-state pass; callers
      // at true scale pass exactGauge = false and keep sketch-only cost
      val exact = keys.groupBy(groupCols.map(col): _*)
        .agg(countDistinct(col("_h")).as("n_exact"))
      folded.join(exact, groupCols)
        .select(groupCols.map(col) ++ Seq(col("n_exact")) ++
          estimateCols(m): _*)
    } else
      folded.select(groupCols.map(col) ++ estimateCols(m): _*)
  }

  /** Typed Aggregator that MERGES stored register arrays (element-wise
    * max — the sketch's native union) — the input is a sketch, not a
    * key, so persisted per-segment registers union engine-side. */
  class MergeAgg(p: Int)
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    require(p >= 4 && p <= 18, s"p must be in [4, 18]: $p")
    private val m = 1 << p
    override def zero: Array[Byte] = new Array[Byte](m)
    private def mx(b: Array[Byte], r: Array[Byte]): Array[Byte] = {
      if (r != null) {
        require(r.length == m, s"register length ${r.length} != $m")
        var i = 0
        while (i < m) { if (r(i) > b(i)) b(i) = r(i); i += 1 }
      }
      b
    }
    override def reduce(b: Array[Byte], r: Array[Byte]): Array[Byte] = mx(b, r)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mx(a, b)
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** Merge-union aggregate over a stored-registers column. */
  def mergeSketches(p: Int)(registers: Column): Column =
    udaf(new MergeAgg(p)).apply(registers)

  /** Frame-native HLL set algebra: union persisted per-segment register
    * rows engine-side — `df` carries one m-byte register array per
    * (segment, …) row; output is one row per `groupCols` value with the
    * merged registers and the union estimate. This is X82's
    * unionEstimate lifted off the driver: at millions of segments the
    * registers never collect — the max-merge combines map-side, the
    * shuffle carries one m-byte buffer per (group, partition), and the
    * estimate runs once per OUTPUT row (a post-aggregate m-byte fold,
    * deliberately off the per-input-row hot path, so the scalar
    * [[estimate]] is reused verbatim — one code path for driver and
    * engine, spec-pinned equal). */
  def unionSketchFrame(df: DataFrame, groupCols: Seq[String],
                       regCol: Column, p: Int): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    df.groupBy(groupCols.map(col): _*)
      .agg(mergeSketches(p)(regCol).as("registers"))
      .select(groupCols.map(col) ++ Seq(col("registers"),
        round(HllEstimate(col("registers")), 6).as("estimate")): _*)
  }

  /** Pairwise segment-overlap matrix from persisted sketches: for every
    * unordered segment pair, the union / inclusion–exclusion
    * intersection / Jaccard estimates — "how much do my sources
    * overlap" across a whole corpus in ONE self-join over m-byte
    * registers, no raw keys touched. The segment frame should already
    * be one row per segment (e.g. [[unionSketchFrame]] output); pairs
    * are seg_a < seg_b. The per-pair merge+estimate is a two-register
    * fold on rows bounded by segment-pair count, not data size. The
    * standard HLL caveat rides along: intersection error is relative to
    * the UNION, so tiny overlaps of huge segments are noisy (clamped at
    * 0 like [[intersectionEstimate]]). */
  def pairwiseOverlap(df: DataFrame, segCol: String, regCol: Column,
                      p: Int): DataFrame = {
    val a = df.select(col(segCol).as("seg_a"), regCol.as("_ra"))
    val b = df.select(col(segCol).as("seg_b"), regCol.as("_rb"))
    a.join(b, col("seg_a") < col("seg_b"))
      .select(col("seg_a"), col("seg_b"),
        round(HllEstimate(col("_ra")), 6).as("est_a"),
        round(HllEstimate(col("_rb")), 6).as("est_b"),
        round(HllUnionEstimate(col("_ra"), col("_rb")), 6).as("est_union"))
      .withColumn("est_intersection",
        round(greatest(col("est_a") + col("est_b") - col("est_union"),
          lit(0.0)), 6))
      .withColumn("jaccard",
        when(col("est_union") > 0,
          round(col("est_intersection") / col("est_union"), 6)))
  }

  /** (groupCols, _bucket, _maxrho) register rows from hashed keys. */
  private def regRows(keys: DataFrame, groupCols: Seq[String],
                      p: Int): DataFrame = {
    val w = 60 - p
    keys
      .select(groupCols.map(col) ++ Seq(
        shiftright(col("_h"), w).as("_bucket"),
        (col("_h").bitwiseAND(lit((1L << w) - 1))).as("_rem")): _*)
      .select(groupCols.map(col) ++ Seq(col("_bucket"),
        when(col("_rem") === 0L, lit(w + 1))
          .otherwise(lit(w) - (length(bin(col("_rem"))) - 1)).as("_rho")): _*)
      .groupBy((groupCols :+ "_bucket").map(col): _*)
      .agg(max(col("_rho")).as("_maxrho"))
  }

  /** Ascending-bucket harmonic fold → (_z, v_zero) per group (or one
    * row when groupCols is empty). */
  private def zvFold(regs: DataFrame, groupCols: Seq[String],
                     m: Int): DataFrame = {
    val listed =
      if (groupCols.isEmpty)
        regs.agg(sort_array(collect_list(struct(col("_bucket"),
          col("_maxrho")))).as("_rs"))
      else
        regs.groupBy(groupCols.map(col): _*)
          .agg(sort_array(collect_list(struct(col("_bucket"),
            col("_maxrho")))).as("_rs"))
    listed
      .select(groupCols.map(col) ++ Seq(
        aggregate(col("_rs"), lit(0.0),
          (acc, r) => acc + pow(lit(2.0), -r.getField("_maxrho").cast("double")))
          .as("_zsum"),
        size(col("_rs")).as("_mp")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("_zsum") + (lit(m) - col("_mp")).cast("double")).as("_z"),
        (lit(m) - col("_mp")).cast("long").as("v_zero")): _*)
  }

  /** (v_zero kept, est_raw, estimate) from _z/v_zero — one precomputed
    * alpha·m² constant so the oracle interpolates the SAME Scala double
    * and both engines evaluate exactly A/z. */
  private def estimateCols(m: Int): Seq[Column] = {
    val a2 = alpha(m) * m.toDouble * m.toDouble
    val eraw = lit(a2) / col("_z")
    Seq(col("v_zero"), round(eraw, 6).as("est_raw"),
      round(when(eraw <= lit(2.5 * m) && col("v_zero") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero").cast("double")))
        .otherwise(eraw), 6)
        .as("estimate"))
  }
}
