package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PqCodec

/** Persisted IVF-PQ index — the build-once / query-many serving shape of
  * `Pq.ivfPqTopK`. That operator trains, encodes, and searches in one
  * plan; at 100 TB the index is built ONCE (one shuffle write) and every
  * later query batch must touch only its probed inverted lists. This
  * object persists exactly the artifacts the search needs:
  *
  *   path/codes/      (neighbor_id, codes) parquet PARTITIONED BY
  *                    centroid_id — probing nProbe lists becomes parquet
  *                    PARTITION PRUNING: the scan reads nProbe/nCentroids
  *                    of the index files, nothing else
  *   path/centroids/  the coarse quantizer (nCentroids slim rows)
  *   path/codebook/   one row: flattened PQ codebook + dims
  *
  * Raw vectors are deliberately NOT duplicated into the index (the
  * m-byte codes are the point); exact re-rank refetches originals from
  * the caller-supplied corpus table, or is skipped (`rerank = None`) for
  * ADC-only scoring — the FAISS-style trade, stated plainly.
  *
  * Determinism: `build` reuses the same md5-sampled centroids, codebook,
  * and codegen encode as `Pq.ivfPqTopK`, so `search` over a built index
  * returns EXACTLY what the in-memory operator returns for the same
  * parameters (asserted in DedupSimilaritySpec). */
object IvfPqIndex {

  private def asDouble(c: org.apache.spark.sql.Column) = c.cast("array<double>")

  /** Train + encode + write the index under `path`. One pass over the
    * corpus (assignment + encode are map-side behind one broadcast of
    * the centroids); the partitioned write is the only shuffle-free
    * fan-out to one directory per inverted list. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, path: String,
            nCentroids: Int = 16, m: Int = 16, dim: Int = 64,
            codebookSize: Int = 16): Unit = {
    require(nCentroids > 0, "nCentroids must be positive")
    val spark = corpus.sparkSession
    val cb = Pq.codebook(corpus, idCol, vecCol, m, dim, codebookSize)
    val (cbFlat, halfFlat) = Pq.flatten(cb)
    val dsub = dim / m
    val c = corpus.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", Similarity.norm(col("cv")))
      .where(col("cn") > 0)
    val cents = Similarity.sampleCentroids(corpus, idCol, vecCol, nCentroids)
    Similarity.assignTo(c, cents)
      .select(col("centroid_id"), col("neighbor_id"),
        PqCodec.encodeCol(transform(col("cv"), x => x / col("cn")),
          cbFlat, halfFlat, m, codebookSize, dsub).as("codes"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$path/codes")
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    import spark.implicits._
    Seq((m, codebookSize, dim, cbFlat.toSeq, halfFlat.toSeq))
      .toDF("m", "k", "dim", "cb_flat", "half_flat")
      .write.mode("overwrite").parquet(s"$path/codebook")
  }

  /** Search a built index. Per query: probe the `nProbe` nearest
    * inverted lists (broadcast centroid table), ADC-score ONLY those
    * lists' code rows — the union of probed list ids is collected
    * driver-side (≤ nProbe·|queries| ints, a bounded probe manifest,
    * like the PQ codebook itself) and pushed into the codes scan as an
    * IN filter, so parquet partition pruning skips every unprobed
    * directory — then exact-cosine re-rank the `rerankDepth` survivors
    * against `rerank`'s raw vectors (usually the original corpus table).
    * `rerank = None` returns ADC-approximate cosines directly.
    * Output: (query_id, neighbor_id, cosine, rank), like the in-memory
    * operator. */
  def search(spark: SparkSession, path: String, queries: DataFrame,
             idCol: String, vecCol: String, k: Int, nProbe: Int = 4,
             rerankDepth: Int = 50,
             rerank: Option[DataFrame] = None): DataFrame = {
    require(k > 0 && nProbe > 0, "k and nProbe must be positive")
    require(rerankDepth >= k, "rerankDepth must be >= k")
    val meta = spark.read.parquet(s"$path/codebook").head()
    val m = meta.getAs[Int]("m")
    val cbSize = meta.getAs[Int]("k")
    val dim = meta.getAs[Int]("dim")
    val cbFlat = meta.getSeq[Double](meta.fieldIndex("cb_flat")).toArray
    val dsub = dim / m
    val cents = spark.read.parquet(s"$path/centroids")
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))
      .where(col("qn") > 0)
      .withColumn("nq", transform(col("qv"), x => x / col("qn")))
      .withColumn("lut", PqCodec.lutCol(col("nq"), cbFlat, m, cbSize, dsub))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"),
        struct(
          (-(Similarity.dot(col("qv"), col("centroid")) /
            (col("qn") * col("centroid_n"))) + lit(0.0)).as("negsim"),
          col("centroid_id")).as("_cand"))
      .groupBy("query_id")
      .agg(slice(array_sort(collect_list(col("_cand"))), 1, nProbe).as("_top"))
      .select(col("query_id"), explode(col("_top.centroid_id")).as("centroid_id"))
      .join(q.select(col("query_id"), col("lut")), Seq("query_id"))
    // the bounded probe manifest → partition-pruning IN filter
    val probedLists = probes.select("centroid_id").distinct()
      .collect().map(_.getLong(0))
    val codes = spark.read.parquet(s"$path/codes")
      .where(col("centroid_id").isin(probedLists: _*))
    val scored = codes.join(broadcast(probes), Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(PqCodec.adcCol(col("lut"), col("codes"), cbSize), 6).as("cosine"))
    rerank match {
      case None => Similarity.topKPerQuery(scored, k)
      case Some(corpus) =>
        val cands = Similarity.topKPerQuery(scored, rerankDepth)
          .select(col("query_id"), col("neighbor_id"))
        val e = corpus.select(col(idCol).as("neighbor_id"),
            asDouble(col(vecCol)).as("cv"))
          .withColumn("cn", Similarity.norm(col("cv")))
          .where(col("cn") > 0)
        val exact = cands.join(e, Seq("neighbor_id"))
          .join(broadcast(q.select(col("query_id"), col("qv"), col("qn"))),
            Seq("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            round(Similarity.dot(col("qv"), col("cv")) /
              (col("qn") * col("cn")), 6).as("cosine"))
        Similarity.topKPerQuery(exact, k)
    }
  }
}
