package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding search at extreme scale —
  * the IVF-PQ half Spark has no analog for: vectors are L2-normalized,
  * split into `m` subvectors, and each subvector is replaced by the id
  * of its nearest codeword from a per-subspace codebook of
  * `codebookSize` entries. A 64-dim float vector (256 B) becomes m
  * 1-byte codes — a 16× memory cut that lets a candidate scan run over
  * codes instead of raw vectors.
  *
  * Search is asymmetric-distance (ADC): each QUERY precomputes a
  * (m × codebookSize) lookup table of partial dots once; scoring a
  * corpus vector is then m array lookups + adds (not a d-dim dot).
  * `pqTopK` scans codes with ADC, keeps `rerankDepth` candidates, and
  * re-ranks them with the exact cosine — the standard recall/cost dial.
  *
  * Determinism/oracle story: the codebook is a hash-sample of corpus
  * vectors (md5 order, like IVF's `sampleCentroids`) collected to the
  * driver (k rows — sampling-based training is the codebook's job at
  * any scale) and embedded as LITERALS, so encoding and ADC are pure
  * map-side codegen'd expressions with no joins, and a SQL oracle can
  * replay every stage bit-for-bit (fixed-order float math throughout:
  * ascending-index dots, fixed j-order LUT sums).
  */
object Pq {

  private def asDouble(c: Column): Column = c.cast("array<double>")
  // nrm must be the ALREADY-COMPUTED norm column: ArrayTransform evaluates
  // its lambda per element interpreted, so an inline norm(c) would re-run
  // a d-dim dot + sqrt for every element (O(d²) per row on the encode scan)
  private def normalize(c: Column, nrm: Column): Column =
    transform(c, x => x / nrm)

  /** Deterministic codebook: the `codebookSize` corpus vectors with the
    * smallest md5-derived hash, L2-normalized, sliced into `m`
    * subspaces. Returns cb(j)(code) = codeword vector (dsub doubles).
    * One tiny TakeOrderedAndProject job + a k-row collect. */
  def codebook(corpus: DataFrame, idCol: String, vecCol: String,
               m: Int, dim: Int, codebookSize: Int): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim ($dim) must split into m ($m) subspaces")
    val dsub = dim / m
    val seeds = corpus
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
      .where(col("nrm") > 0)
      .orderBy(Sampling.hash24(col("id"), "pq").asc, col("id").asc)
      .limit(codebookSize)
      .select(normalize(col("v"), col("nrm")).as("nv"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(seeds.length == codebookSize,
      s"corpus has only ${seeds.length} non-zero vectors < codebookSize $codebookSize")
    Array.tabulate(m)(j => seeds.map(_.slice(j * dsub, (j + 1) * dsub)))
  }

  /** Code of subvector j under codebook `cb`: argmin L2 distance =
    * argmax (x_j · c − ‖c‖²/2), smallest code on exact ties. Pure
    * codegen'd expression: codebookSize dots of dsub dims per subspace. */
  private def codeOf(nv: Column, cb: Array[Array[Array[Double]]],
                     j: Int, dsub: Int): Column = {
    val sub = slice(nv, j * dsub + 1, dsub)
    val cands = cb(j).zipWithIndex.map { case (cw, code) =>
      val half = cw.map(x => x * x).sum / 2.0
      // + 0.0 canonicalizes -0.0 (struct order distinguishes the zeros,
      // SQL ORDER BY does not — same fix as topKPerQuery)
      struct((-(Similarity.dot(sub, typedlit(cw.toSeq)) - lit(half)) + lit(0.0)).as("negs"),
        lit(code).as("code"))
    }
    least(cands: _*).getField("code")
  }

  /** (id, code_0 … code_{m-1}) — normalized-vector PQ codes, map-side
    * only (zero-norm vectors excluded, mirroring Similarity). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             cb: Array[Array[Array[Double]]], dim: Int): DataFrame = {
    val m = cb.length
    val dsub = dim / m
    val base = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
      .where(col("nrm") > 0)
      .withColumn("nv", normalize(col("v"), col("nrm")))
    base.select(col("id") +:
      (0 until m).map(j => codeOf(col("nv"), cb, j, dsub).as(s"c$j")): _*)
  }

  /** ADC top-k with exact re-rank: ADC-score every (query, code row)
    * pair via the query-side LUT (m lookups + adds per pair), keep
    * `rerankDepth` per query, re-rank those exactly by cosine.
    * Output: (query_id, neighbor_id, cosine, rank).
    *
    * Scale shape: queries (with their LUTs) broadcast; the corpus scan
    * reads only the m-byte codes (+ id); the exact re-rank joins raw
    * vectors for rerankDepth·|queries| rows only. No window, no
    * corpus shuffle; top-k via the k-bounded aggregate. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 16, dim: Int = 64,
             codebookSize: Int = 16, rerankDepth: Int = 50): DataFrame = {
    require(rerankDepth >= k, "rerankDepth must be >= k")
    val dsub = dim / m
    val cb = codebook(corpus, idCol, vecCol, m, dim, codebookSize)
    val codes = encode(corpus, idCol, vecCol, cb, dim)
      .withColumnRenamed("id", "neighbor_id")
    // query-side LUT: lut[j][code] = q_j · cb(j)(code) (m·k dots per
    // query, computed once on the tiny broadcast side)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))
      .where(col("qn") > 0)
      .withColumn("nq", normalize(col("qv"), col("qn")))
      .withColumn("lut", array((0 until m).map { j =>
        array(cb(j).map(cw =>
          Similarity.dot(slice(col("nq"), j * dsub + 1, dsub),
            typedlit(cw.toSeq))): _*)
      }: _*))
    // ADC score: fixed j-order sum of LUT lookups — deterministic and
    // cheap (no per-pair d-dim dot)
    val adc = (0 until m).map(j =>
      element_at(element_at(col("lut"), j + 1), col(s"c$j") + 1))
      .reduce(_ + _)
    val scored = codes.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(adc, 6).as("cosine")) // approx cosine (normalized inputs)
    val cands = Similarity.topKPerQuery(scored, rerankDepth)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank of the bounded candidate set
    val e = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", Similarity.norm(col("cv")))
      .where(col("cn") > 0)
    val exact = cands
      .join(e, Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"), col("qn"))), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6)
          .as("cosine"))
    Similarity.topKPerQuery(exact, k)
  }
}
