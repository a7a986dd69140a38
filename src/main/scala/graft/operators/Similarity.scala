package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths:
  *  - `bruteForceTopK` — exact cosine top-k via a broadcast cross join:
  *    the baseline, correct at any corpus size as long as the QUERY set is
  *    broadcastable (corpus streams map-side, one partial top-k per
  *    partition then a tiny final top-k — no O(corpus) shuffle).
  *  - `lshTopK` — random-hyperplane LSH: corpus is bucketed by a
  *    sign-bit signature; queries probe their own bucket (+ multi-probe
  *    single-bit flips), and only bucket members are scored. This is the
  *    100 TB path: candidate generation is an equi-join on the bucket
  *    key; recall tunes with planes/probes.
  *
  * All arithmetic is double (float inputs cast first — float×float in
  * binary32 would lose the determinism the oracle compare relies on).
  */
object Similarity {

  /** Codegen'd native loop (graft.functions.VectorDot); identical
    * semantics to `aggregate(zip_with(a, b, *), 0d, +)` but ~2 orders of
    * magnitude faster per pair. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k neighbors for each query vector (cosine, self excluded).
    * Output: (query_id, neighbor_id, cosine, rank). Cosine is rounded to
    * 6 dp BEFORE ranking with an id tiebreak, so ranks are reproducible
    * across engines and run-to-run. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .repartition(par)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes (seeded; no RNG state). */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(planes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit LSH signature of a vector under `planes`. */
  def signature(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p.toSeq)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** IVF-style ANN: the corpus is clustered into `nCentroids` inverted
    * lists (centroids = a deterministic sample of the corpus itself —
    * evenly spaced by id, a cheap stand-in for a k-means pass whose
    * assignment/probe machinery is identical); each query probes its
    * `nProbe` nearest lists and re-ranks exactly within them.
    *
    * Scale shape: assignment is a broadcast join corpus×centroids (one
    * map pass), the probe is an equi-join on the list id — the corpus
    * never cross-joins queries, and recall tunes with nProbe. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCentroids: Int = 16,
              nProbe: Int = 4): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .repartition(par)
    // deterministic centroid sample: rank by id, take evenly spaced rows
    val n = corpus.count()
    val step = math.max(n / nCentroids, 1L)
    val cents = c.withColumn("_rk",
        row_number().over(Window.orderBy("neighbor_id")).cast("long"))
      .where(pmod(col("_rk") - 1, lit(step)) === 0)
      .limit(nCentroids)
      .select(col("neighbor_id").as("centroid_id"), col("cv").as("centroid"),
        col("cn").as("centroid_n"))
    // corpus assignment: nearest centroid per vector (rank 1)
    val wAssign = Window.partitionBy("neighbor_id")
      .orderBy(desc("sim"), col("centroid_id"))
    val assigned = c.crossJoin(broadcast(cents))
      .select(col("neighbor_id"), col("cv"), col("cn"), col("centroid_id"),
        (dot(col("cv"), col("centroid")) / (col("cn") * col("centroid_n"))).as("sim"))
      .withColumn("_r", row_number().over(wAssign))
      .where(col("_r") === 1)
      .select(col("centroid_id"), col("neighbor_id"), col("cv"), col("cn"))
    // queries probe their nProbe nearest lists
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(desc("sim"), col("centroid_id"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("qn"), col("centroid_id"),
        (dot(col("qv"), col("centroid")) / (col("qn") * col("centroid_n"))).as("sim"))
      .withColumn("_r", row_number().over(wProbe))
      .where(col("_r") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("centroid_id"))
    // exact re-rank within probed lists
    val scored = assigned.join(broadcast(probes), Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cosine"))
      .groupBy("query_id", "neighbor_id").agg(max("cosine").as("cosine"))
    val wRank = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(wRank).cast("long"))
      .where(col("rank") <= k)
  }

  /** Approximate top-k: score only corpus vectors whose LSH bucket matches
    * the query's bucket or any single-bit flip of it (multi-probe). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 12, dim: Int = 64): DataFrame = {
    val hp = hyperplanes(planes, dim)
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = corpus.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("bucket", signature(col("cv"), hp))
      .repartition(par)
    val q0 = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .withColumn("bucket0", signature(col("qv"), hp))
    // multi-probe: own bucket + every single-bit flip
    val probes = q0.select(col("query_id"), col("qv"), col("qn"),
      explode(expr(s"concat(array(bucket0), transform(sequence(0, ${planes - 1}), " +
        "i -> bucket0 ^ shiftleft(1L, i)))")).as("bucket"))
    val scored = c.join(broadcast(probes), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cosine"))
      .groupBy("query_id", "neighbor_id").agg(max("cosine").as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
