package graft

import org.apache.spark.sql.functions._

/** Dev tool (round-15, VERDICT r14 #6): synthesize an N× scale dir from
  * a base testdata dir so per-query CORE-RATIO measurements mean
  * something — sf0.1 is overhead-dominated (the whole suite ran ×0.97
  * at 8 vs 32 cores in BENCH_r14_c8) and, worse, every sf table is ONE
  * parquet row group, so scan-side work cannot parallelize at all.
  *
  * documents/embeddings/events are unioned `copies` times with salted
  * ids (the ScaleSmoke discipline); document text gets a per-copy
  * suffix so the exact-dup stages don't degenerate to empty outputs
  * (copies stay NEAR-dups — the pair stages still stress their guards).
  * Everything is written `repartition(32)` so the scaled tables have
  * real file/row-group parallelism, which is what a 100 TB table has.
  * Remaining tables copy through 1× unchanged (reference joins keep
  * their semantics).
  *
  * NOT part of the driver contract; results over this dir are timing
  * evidence only (no oracle).
  *
  * Usage: runMain graft.SynthScale <baseDir> <outDir> <copies>
  */
object SynthScale {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: SynthScale <baseDir> <outDir> <copies>")
    val Array(base, out, copiesS) = args
    val copies = copiesS.toInt
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val salt = 1000000000L
    def scaled(name: String, idCol: String, perturb: Boolean): Unit = {
      val df = spark.read.parquet(s"$base/$name.parquet")
      val u = (0 until copies).map { i =>
        val d = df.withColumn(idCol, col(idCol) + lit(i * salt))
        if (perturb && i > 0)
          d.withColumn("text", concat(col("text"), lit(s" c$i")))
        else d
      }.reduce(_ union _)
      u.repartition(32).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[synth] $name x$copies")
    }
    scaled("documents", "doc_id", perturb = true)
    scaled("embeddings", "vec_id", perturb = false)
    scaled("events", "event_id", perturb = false)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { n =>
      spark.read.parquet(s"$base/$n.parquet")
        .write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"[synth] $n x1")
    }
    spark.stop()
  }
}
