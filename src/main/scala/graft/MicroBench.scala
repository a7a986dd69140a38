package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop micro-bench: time a SUBSET of SparkEntry.queries in THIS JVM
  * (one fresh-session pass, same session shape and timed action as
  * Bench.runOnce). Drive it from a shell loop over fresh `java -cp`
  * invocations and take per-query mins — the Bench estimator, minus the
  * 173-query wall-clock when only a few queries are under the knife.
  * NOT part of the driver contract (Bench is); emits the same one-line
  * JSON for easy diffing.
  *
  * Usage: graft.MicroBench <namePrefix,...>
  * Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (as Bench)
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: MicroBench <namePrefix,...>")
    val prefixes = args(0).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // keep the dev loop's session identical to Bench.runOnce (the shared
    // GraftSession harness builder)
    var b = GraftSession.recommended(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
    // config-attribution knob: "k=v;k=v" overrides for A/B experiments
    sys.env.get("SPARK_GRAFT_MICRO_CONFS").foreach(_.split(";")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b = b.config(k, v)
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftPlans.install(spark)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    val out = names.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val n = try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[micro] $name%-28s $sec%8.2fs  rows=$n")
      name -> sec
    }
    spark.stop()
    val qs = out.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.4f",
        java.lang.Double.valueOf(v))
    }.mkString("{", ",", "}")
    println(s"""{"metric":"micro","queries":$qs}""")
  }
}
