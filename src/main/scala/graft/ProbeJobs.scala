package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val qname = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftPlans.install(spark)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties.getProperty("spark.job.description")).getOrElse("")
        val cs = Option(j.properties.getProperty("callSite.short")).getOrElse("")
        starts.put(j.jobId, (System.nanoTime(), s"$cs | $desc"))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, d) = starts.get(j.jobId)
        System.out.println(f"[job] ${j.jobId}%4d ${(System.nanoTime()-t0)/1e9}%7.3fs  $d")
      }
    })
    val fn = SparkEntry.queries(qname)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    println(f"[total] ${(System.nanoTime()-t0)/1e9}%.2fs rows=$n")
    Thread.sleep(500)
    spark.stop()
  }
}
