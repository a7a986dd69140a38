package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the dedup pipelines. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import graft.sources.Tables

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    time("warmup docs.count")(docs.count())

    // A: inline (no shared cache) — what round-1 bench effectively ran
    time("A1 jaccardPairs inline") {
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.05, Int.MaxValue).count()
    }
    time("A2 minhash+lsh inline") {
      Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(docs, "doc_id", "text", 3, 64), 16, 4)
        .where(col("est_jaccard") >= 0.2).count()
    }

    // B: tokenize-once shared hashed-shingle cache
    val shared = Dedup.shingleHashRows(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("B0 cache build (count)")(shared.count())
    time("B1 jaccardPairsFromHashes") {
      Dedup.jaccardPairsFromHashes(shared, 0.05, Int.MaxValue).count()
    }
    time("B2 minhashFromHashes+lsh") {
      Dedup.lshCandidatePairs(Dedup.minhashFromHashes(shared, 64), 16, 4)
        .where(col("est_jaccard") >= 0.2).count()
    }
    time("B1b jaccard again (warm)") {
      Dedup.jaccardPairsFromHashes(shared, 0.05, Int.MaxValue).count()
    }
    time("B2b minhash again (warm)") {
      Dedup.lshCandidatePairs(Dedup.minhashFromHashes(shared, 64), 16, 4)
        .where(col("est_jaccard") >= 0.2).count()
    }
    spark.stop()
  }
}
