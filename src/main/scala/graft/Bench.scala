package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftPlans.install(spark)
    // warm up codegen/JIT + file-source paths once so the first measured
    // query doesn't absorb session start-up cost
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // ≥3 runs with per-query MEDIANS: single-run numbers on this class of
    // VM wobble ±0.5 s on sub-second queries, which reads as a phantom
    // regression; the median is the per-query figure reported. The
    // tokenize-once cache is cleared between runs so every run pays the
    // shingle build exactly once, like a single-run bench.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val samples = (1 to runs).map { r =>
      TextSimQueries.clearSessionCache(spark)
      names.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val n = try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] run $r/$runs $name%-28s $sec%8.2fs  rows=$n")
        name -> sec
      }.toMap
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = names.map { case (name, _) =>
      name -> median(samples.map(_(name)))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
