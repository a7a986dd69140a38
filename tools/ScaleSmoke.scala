package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-shot ~10× scale smoke for the dedup family — NOT part of the
  * graded bench. The skew guards and shared exchanges in q_d2/q_d3/q_d5
  * are plan-asserted in the specs but the specs top out at sf0.1
  * (~60 k documents); this drives the same guarded production paths at
  * ~600 k docs / ~500 k vectors by unioning sf0.1 ten times with salted
  * ids (texts/vectors repeat verbatim, so every row gains 9 exact
  * copies — a worst-case bucket-inflation stress for the guards).
  *
  * Run (tools/ is outside the compile path on purpose):
  *   cp tools/ScaleSmoke.scala src/main/scala/graft/ &&
  *   sbt "runMain graft.ScaleSmoke" ; rm src/main/scala/graft/ScaleSmoke.scala
  * Timings are recorded in COVERAGE.md ("scale smoke" note).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val copies = 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def times10(df: DataFrame, idCol: String): DataFrame =
      (0 until copies).map(i => df.withColumn(idCol,
        col(idCol) + lit(i.toLong * 1000000000L))).reduce(_ union _)

    val docs = times10(
      spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text"),
      "doc_id")
    val emb = times10(
      spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding"),
      "vec_id")
    println(s"docs=${docs.count()} vecs=${emb.count()}")

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1fs  rows=$n")
    }

    // same parameters and production-default guards as the oracled queries
    val rows = Dedup.shingleHashRows(docs, "doc_id", "text", n = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("shingleHashRows") { rows.count() }
    timed("q_d2 jaccardPairs") {
      Dedup.jaccardPairsFromHashes(rows, minJaccard = 0.05,
        maxBucketSize = 1000).count()
    }
    timed("q_d3 minhash+lsh") {
      Dedup.lshCandidatePairs(
          Dedup.minhashFromHashes(rows, k = 64), bands = 16, rowsPerBand = 4)
        .where(col("est_jaccard") >= 0.2).count()
    }
    timed("q_d5 embeddingNearDups") {
      Dedup.embeddingNearDups(emb, "vec_id", "embedding", minCosine = 0.4,
        planes = 64, bands = 16, dim = 64).count()
    }
    spark.stop()
  }
}
