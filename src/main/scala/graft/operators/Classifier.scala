package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine TRAINABLE quality/domain classifier — logistic regression
  * over hashed bag-of-words features by full-batch gradient descent,
  * run as Spark aggregates (the fastText-style linear classifier a
  * curation pipeline fits on "good vs bad" seed labels, then sweeps
  * across the corpus; [[TextStats.hashedClassifierScore]] is the
  * FIXED-weight scorer — this learns the weights).
  *
  * Determinism contract (the same integer-grid discipline as
  * `Graph.pageRank`'s nano-ranks, so a SQL oracle replays EVERY
  * iteration bit-for-bit):
  *   - weights live in integer MICRO units (w_micro = w·1e6);
  *   - a doc's logit numerator Σ_b x_b·w_micro(b) is a pure BIGINT sum
  *     (exact in any partition order), and z = that / (n_words·1e6) —
  *     the mean-weight normalization [[TextStats.hashedClassifierScore]]
  *     uses, keeping z bounded for any doc length;
  *   - p = sigmoid(z) is one `exp` (the libm call the oracled q_t12
  *     already replays), and the residual r = p − y re-grids through
  *     the explicit floor(r·1e6 + 0.5) — never an engine round;
  *   - the gradient Σ_i r_micro,i·x_i,b is again a pure BIGINT sum, and
  *     the weight step floor(lr·g/N + 0.5) re-grids once per iteration.
  *
  * Scale shape: features are ONE tokenize pass reduced to (doc, bucket,
  * count) rows (hash trick — vocabulary never materializes); each
  * iteration is ONE map-side pass over those rows (weights ride along
  * as a broadcast dim-sized literal array — the codebook pattern) + two
  * hash aggregates (per-doc logit, per-bucket gradient) + a dim-row
  * collect. The model is dim-sized by construction; nothing grows with
  * the corpus.
  */
object Classifier {

  /** (id, b, x) hashed token counts + (id, n) doc lengths: bucket =
    * hash24(token) % dim, the q_t12 hashing. */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
                     dim: Int, salt: String = "graft"): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    df.select(col(idCol).as("id"),
        explode(regexp_extract_all(lower(col(textCol)),
          lit(TextStats.WordPattern), lit(0))).as("_t"))
      .select(col("id"), (Sampling.hash24(col("_t"), salt) % dim).as("b"))
      .groupBy("id", "b").agg(count(lit(1)).as("x"))
  }

  /** [[hashedFeatures]] plus the BIAS row (bucket = dim, x = 1, every
    * doc) — the intercept that absorbs class imbalance so the token
    * weights learn separation, not the base rate. */
  private def featuresWithBias(df: DataFrame, idCol: String,
                               textCol: String, dim: Int,
                               salt: String): DataFrame =
    hashedFeatures(df, idCol, textCol, dim, salt)
      .union(df.select(col(idCol).as("id"), lit(dim.toLong).as("b"),
        lit(1L).as("x")))

  /** Train micro-unit weights: `iters` full-batch GD steps from w = 0.
    * Returns the (dim+1)-sized micro-weight array (index dim = the bias
    * weight; the persistable model — pair with [[score]]). One count
    * job (N) + 2 jobs per iteration.
    *
    * `sampleFraction < 1.0` trains on a HASH-DETERMINISTIC Bernoulli
    * subsample of the labeled docs ([[Sampling.sampleByHash]] — a pure
    * function of the id, so the sampled run is itself replayable by an
    * oracle, and re-running on the same corpus picks the same docs).
    * At 100 TB full-batch GD costs 2 corpus-sized shuffle jobs × iters;
    * a 1–10% stable subsample of the (already human-bounded) label set
    * cuts that 10–100× with the same convergence behavior for a linear
    * model. The sample filter is map-side (pushes to the scan); the
    * default 1.0 is bit-identical to the unsampled path. */
  def train(df: DataFrame, idCol: String, textCol: String, labelCol: String,
            dim: Int = 64, iters: Int = 3, lr: Double = 0.5,
            salt: String = "graft", sampleFraction: Double = 1.0): Array[Long] = {
    require(iters >= 1 && iters <= 100, s"iters out of range: $iters")
    require(lr > 0, s"lr must be positive: $lr")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction out of (0,1]: $sampleFraction")
    val base =
      if (sampleFraction < 1.0)
        Sampling.sampleByHash(df, idCol, sampleFraction, salt + "|train")
      else df
    trainFull(base, idCol, textCol, labelCol, dim, iters, lr, salt)
  }

  private def trainFull(df: DataFrame, idCol: String, textCol: String,
                        labelCol: String, dim: Int, iters: Int, lr: Double,
                        salt: String): Array[Long] = {
    // NOTE (round-14 optimization audit): pre-partitioning fx by id
    // (repartition + persist, so every iteration's groupBy(id) and
    // gradient join run exchange-free) was implemented and MEASURED
    // SLOWER at bench scale — isolated per-query A/B ×1.24: the AQE-
    // coalesced per-iteration exchanges over this data are near-free,
    // while the forced shuffle-partition-count cache scan pays
    // iters × tasks of scheduling. Reverted to the checkpointed
    // unpartitioned form; at true 100 TB feature volume, revisit with
    // input-sized (not config-sized) partitioning.
    val fx = featuresWithBias(df, idCol, textCol, dim, salt)
      .join(df.select(col(idCol).as("id"),
        greatest(TextStats.wordCount(col(textCol)), lit(1L)).as("n"),
        col(labelCol).cast("long").as("y")), Seq("id"))
      .localCheckpoint()
    val nDocs = df.count().toDouble
    var w = new Array[Long](dim + 1)
    for (_ <- 1 to iters) {
      val wLit = typedlit(w.toSeq)
      val perDoc = fx
        .withColumn("_zn", col("x") * element_at(wLit, (col("b") + 1).cast("int")))
        .groupBy("id").agg(sum(col("_zn")).as("_z"),
          first(col("n")).as("_n"), first(col("y")).as("_y"))
        .withColumn("_p", lit(1.0) / (lit(1.0) +
          exp(-(col("_z").cast("double") / (col("_n").cast("double") * lit(1e6))))))
        .select(col("id"),
          floor((col("_p") - col("_y").cast("double")) * lit(1e6) + lit(0.5))
            .as("_r"))
      val grad = fx.join(perDoc, Seq("id"))
        .groupBy("b").agg(sum(col("_r") * col("x")).as("g"))
        .collect()
      val next = w.clone()
      grad.foreach { row =>
        val b = row.getAs[Long]("b").toInt
        val g = row.getAs[Long]("g")
        next(b) = next(b) - math.floor(lr * g / nDocs + 0.5).toLong
      }
      w = next
    }
    w
  }

  /** Score with a trained micro-weight array: (id, z, p) — z the mean
    * micro-weight logit, p = sigmoid(z), both re-gridded through the
    * explicit floor(x·1e6 + 0.5)/1e6 (NOT an engine `round`: z is a
    * rational whose shortest decimal repr routinely terminates in a
    * 7th-digit 5, exactly the HALF_UP-vs-half-even engine split the
    * nano-rank PageRank hit — measured again here at sf0.1 before this
    * formulation). The grouped form (feature frame + one aggregate) —
    * for streams use [[scoreRowwise]], which is integer-identical with
    * no aggregate at all. */
  def score(df: DataFrame, idCol: String, textCol: String, w: Array[Long],
            dim: Int, salt: String = "graft"): DataFrame = {
    require(w.length == dim + 1,
      s"weight length ${w.length} != dim+1 ${dim + 1}")
    val wLit = typedlit(w.toSeq)
    val fx = featuresWithBias(df, idCol, textCol, dim, salt)
      .withColumn("_zn", col("x") * element_at(wLit, (col("b") + 1).cast("int")))
      .groupBy("id").agg(sum(col("_zn")).as("_z"))
    def grid6(c: Column): Column =
      floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val zraw = coalesce(col("_z"), lit(0L)).cast("double") /
      (col("_n").cast("double") * lit(1e6))
    df.select(col(idCol).as("id"),
        greatest(TextStats.wordCount(col(textCol)), lit(1L)).as("_n"))
      .join(fx, Seq("id"), "left")
      .select(col("id"), grid6(zraw).as("z"),
        grid6(lit(1.0) / (lit(1.0) + exp(-zraw))).as("p"))
  }

  /** Row-wise scorer — identical integer logit to [[score]]
    * (Σ_tokens w[bucket(token)] ≡ Σ_buckets x_b·w_b) computed as ONE
    * map-side fold per row, no explode, no aggregate: this is the form
    * that serves a STREAM unchanged (stateless, verdicts idempotent
    * under replay — spec-gated stream == batch). The HOF lambda is
    * interpreted; acceptable for a serving gate, use [[score]]'s
    * grouped form for bulk batch sweeps. */
  def scoreRowwise(df: DataFrame, idCol: String, textCol: String,
                   w: Array[Long], dim: Int,
                   salt: String = "graft"): DataFrame = {
    require(w.length == dim + 1,
      s"weight length ${w.length} != dim+1 ${dim + 1}")
    val wLit = typedlit(w.toSeq)
    val toks = regexp_extract_all(lower(col(textCol)),
      lit(TextStats.WordPattern), lit(0))
    val zsum = aggregate(toks, lit(0L), (acc, t) =>
      acc + element_at(wLit,
        ((Sampling.hash24(t, salt) % dim) + 1).cast("int"))) +
      element_at(wLit, lit(dim + 1)) // the bias row every doc carries
    val n = greatest(size(toks), lit(1)).cast("double")
    val zraw = zsum.cast("double") / (n * lit(1e6))
    def grid6(c: Column): Column =
      floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    df.select(col(idCol).as("id"), grid6(zraw).as("z"),
      grid6(lit(1.0) / (lit(1.0) + exp(-zraw))).as("p"))
  }
}
