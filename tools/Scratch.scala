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
    val shingles = Dedup.shingleHashRows(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingle cache")(shingles.count())
    val pairs = Dedup.jaccardPairsFromHashes(shingles, 0.05, Int.MaxValue)
    time("jaccard pairs")(pairs.count())
    val pairsC = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("pairs cached")(pairsC.count())
    time("labels (cached pairs)") {
      Dedup.componentLabels(pairsC, onPass = (it, changed, sec) =>
        println(f"[scratch] pass $it changed=$changed $sec%.2fs")).count()
    }
    spark.stop()
  }
}
