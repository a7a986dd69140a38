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
      println(f"[scratch] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())
    val tok = docs
      .select(col("doc_id").as("id"), Dedup.words(col("text")).as("w"))
      .repartition(32)
    time("tokenized words")(tok.count())
    val sh = tok.select(col("id"), Dedup.shinglesFromWords(col("w"), 3).as("sh"))
    time("shingles")(sh.count())
    val ex = sh.select(col("id"), explode(col("sh")).as("s"))
    time("exploded")(ex.count())
    val h = ex.select(col("id"), xxhash64(col("s")).as("h1"))
    time("hashed")(h.count())
    val aggs = (0 until 64).map(i => min(xxhash64(lit(i), col("h1"))).as(s"_h$i"))
    val sig = h.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until 64).map(i => col(s"_h$i")): _*).as("sig"))
    time("signatures")(sig.count())
    val sigC = sig.cache()
    time("signatures cached")(sigC.count())
    val banded = sigC.select(col("id"), col("sig"),
      posexplode(expr("transform(sequence(0, 15), b -> xxhash64(b, slice(sig, b * 4 + 1, 4)))"))
        .as(Seq("band", "bhash")))
    time("banded")(banded.count())
    val joined = banded.as("a").join(banded.as("b"),
      col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
        col("a.id") < col("b.id"))
    time("self-join pairs")(joined.count())
    time("full q_d3 (current impl)") {
      Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(docs, "doc_id", "text", 3, 64), 16, 4).count()
    }
    spark.stop()
  }
}
