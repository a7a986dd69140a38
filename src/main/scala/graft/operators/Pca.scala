package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoder}

/** PCA over an embedding column — the dimensionality-reduction step a
  * 100 TB pipeline runs in front of ANN indexing (project 64-d → 16-d,
  * then IVF/PQ the projections: 4× less ADC work at near-identical
  * recall when the spectrum decays). No reference analogue —
  * training-pipeline superset scope, composing with `Similarity`/`Pq`.
  *
  * Scale shape: the ONLY distributed pass is [[MomentsAgg]], a
  * map-side-combinable sufficient-statistics aggregate (n, Σv, upper
  * triangle of Σ v⊗v — one ~17 KB buffer per partition crosses the
  * exchange, never a row). Eigen-decomposition runs on the driver over
  * the d×d covariance — d is the embedding width (64 here), so this is
  * the same "k-row driver artifact" pattern as the PQ codebook, NOT a
  * driver-side data pass. Projection is a broadcast of k×d doubles into
  * codegen'd dot products, map-side.
  */
object Pca {

  /** One-pass sufficient statistics for PCA: buffer layout is
    * [n, s_0..s_{d-1}, g_00, g_01, .., g_0(d-1), g_11, ..] with g the
    * UPPER triangle of Σ v⊗v in row-major order. Merge is element-wise
    * addition, so partial aggregation combines map-side and the shuffle
    * carries one buffer per partition regardless of corpus size. Null
    * vectors are skipped; a wrong-width vector fails loudly (silently
    * truncating would corrupt every covariance entry). */
  class MomentsAgg(dim: Int)
      extends Aggregator[Seq[Double], Array[Double], Array[Double]] {
    require(dim > 0, s"dim must be positive: $dim")
    private val tri = dim * (dim + 1) / 2
    override def zero: Array[Double] = new Array[Double](1 + dim + tri)
    override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
      if (v == null) return b
      require(v.length == dim,
        s"embedding width ${v.length} != declared dim $dim")
      b(0) += 1.0
      var i = 0
      while (i < dim) { b(1 + i) += v(i); i += 1 }
      var k = 1 + dim
      i = 0
      while (i < dim) {
        val vi = v(i)
        var j = i
        while (j < dim) { b(k) += vi * v(j); j += 1; k += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Double]): Array[Double] = b
    override def bufferEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
  }

  /** (n, Σv, upper-triangle Σ v⊗v) of `vecCol` in one distributed pass. */
  def moments(emb: DataFrame, vecCol: String, dim: Int)
      : (Long, Array[Double], Array[Double]) = {
    val agg = udaf(new MomentsAgg(dim), ExpressionEncoder[Seq[Double]]())
    val row = emb.select(agg(col(vecCol).cast("array<double>")).as("m"))
      .head().getSeq[Double](0).toArray
    val n = row(0).toLong
    require(n > 0, "moments of an empty corpus")
    (n, row.slice(1, 1 + dim), row.slice(1 + dim, row.length))
  }

  /** Upper-triangle Gram and covariance entries as rows (i ≤ j) — the
    * oracled surface of [[moments]]: gram = Σ v_i·v_j and
    * cov = gram/n − mean_i·mean_j, both on the 1e-6 grid (the same
    * double-sum + round-6 discipline as the cosine oracles). The 2 080
    * entries are a driver-side artifact of the one-pass aggregate, like
    * the PQ codebook. */
  def gramLongForm(emb: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val (n, sums, gram) = moments(emb, vecCol, dim)
    // HALF_UP, not rint (half-even): Spark's round() and DuckDB's round()
    // both round ties away from zero — the driver-side rounding must too.
    // `+ 0.0` canonicalizes -0.0 → +0.0 (BigDecimal has no signed zero so
    // a tiny negative that rounds to zero loses its sign bit here, while
    // DuckDB's round() keeps it — same IEEE discipline as Similarity.topKPerQuery)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val rows = for {
      i <- 0 until dim
      j <- i until dim
    } yield {
      val g = gram(i * dim - i * (i - 1) / 2 + (j - i))
      (i.toLong, j.toLong, r6(g),
        r6(g / n - (sums(i) / n) * (sums(j) / n)))
    }
    emb.sparkSession.createDataFrame(rows).toDF("i", "j", "gram", "cov")
  }

  /** A fitted PCA: `mean` of the corpus, top-k unit eigenvectors of the
    * covariance (eigenvalue-descending, sign-canonical), their variances,
    * and the covariance trace (total variance) for share-of-variance
    * reporting. */
  final case class PcaModel(mean: Array[Double],
                            components: Array[Array[Double]],
                            variances: Array[Double],
                            totalVariance: Double)

  /** Fit PCA on `vecCol` with ONE distributed moments pass (cyclic
    * Jacobi on the driver-side d×d covariance; deterministic — no RNG).
    * Component rows are unit-norm eigenvectors, eigenvalue-descending,
    * sign-canonical (largest-|x| coordinate positive). */
  def fit(emb: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]: $k")
    val (n, sums, gram) = moments(emb, vecCol, dim)
    val mean = sums.map(_ / n)
    val c = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      val g = gram(i * dim - i * (i - 1) / 2 + (j - i))
      val v = g / n - mean(i) * mean(j)
      c(i)(j) = v; c(j)(i) = v
    }
    val (values, vectors) = jacobiEigen(c)
    val order = values.indices.sortBy(i => -values(i)).take(k)
    val comps = order.map { idx =>
      val v = vectors.map(_(idx))
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, comps, order.map(values).toArray,
      (0 until dim).map(i => c(i)(i)).sum)
  }

  /** Top-`k` components + variances (see [[fit]]). */
  def principalComponents(emb: DataFrame, vecCol: String, dim: Int, k: Int)
      : (Array[Array[Double]], Array[Double]) = {
    val m = fit(emb, vecCol, dim, k)
    (m.components, m.variances)
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix (in-place
    * on a copy). Returns (eigenvalues, column-eigenvector matrix).
    * Converges quadratically; 30 sweeps is far past machine precision
    * for d ≤ a few hundred. */
  private[operators] def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 30 && off > 1e-14) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-18) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          // t = sign(θ)/(|θ|+√(θ²+1)), the smaller-angle root; θ=0 → 1
          val t =
            if (theta == 0.0) 1.0
            else math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val cs = 1.0 / math.sqrt(t * t + 1.0)
          val sn = t * cs
          for (i <- 0 until d) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = cs * aip - sn * aiq
            a(i)(q) = sn * aip + cs * aiq
          }
          for (i <- 0 until d) {
            val api = a(p)(i); val aqi = a(q)(i)
            a(p)(i) = cs * api - sn * aqi
            a(q)(i) = sn * api + cs * aqi
          }
          for (i <- 0 until d) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = cs * vip - sn * viq
            v(i)(q) = sn * vip + cs * viq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** ROTATE `vecCol` onto `components` (k×d): adds `outCol` = array of k
    * coordinates. Broadcast-by-literal into codegen'd dot products —
    * map-side, no shuffle, no UDF.
    *
    * This is the raw (uncentered) rotation: at full rank it preserves
    * inner products exactly, but its TRUNCATION error is eigenvalue-
    * bounded only when the corpus mean is ~0 — a large mean has
    * components along the discarded directions that the eigenvalue
    * spectrum says nothing about. For the standard PCA guarantee use
    * [[projectCentered]]. */
  def project(df: DataFrame, vecCol: String, components: Array[Array[Double]],
              outCol: String = "projected"): DataFrame = {
    require(components.nonEmpty, "no components")
    val dots = components.map(c =>
      Similarity.dot(col(vecCol).cast("array<double>"), typedlit(c.toSeq)))
    df.withColumn(outCol, array(dots.toIndexedSeq: _*))
  }

  /** Standard PCA projection: (v − mean)·components. Truncation L2 error
    * is bounded by the discarded eigenvalue sum — the guarantee the
    * spectrum actually gives. Same map-side shape as [[project]] (the
    * centering folds into each dot as a constant offset). */
  def projectCentered(df: DataFrame, vecCol: String, model: PcaModel,
                      outCol: String = "projected"): DataFrame = {
    val dots = model.components.map { c =>
      val offset = c.zip(model.mean).map { case (ci, mi) => ci * mi }.sum
      Similarity.dot(col(vecCol).cast("array<double>"), typedlit(c.toSeq)) -
        lit(offset)
    }
    df.withColumn(outCol, array(dots.toIndexedSeq: _*))
  }
}
