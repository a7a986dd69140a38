package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val qname = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties.getProperty("spark.job.description")).getOrElse("")
        val cs = Option(j.properties.getProperty("callSite.short")).getOrElse("")
        val stages = j.stageInfos.map(si =>
          s"${si.name.takeWhile(_ != '\n').take(60)}(${si.numTasks})")
          .mkString(" <- ")
        starts.put(j.jobId,
          (System.nanoTime(), s"$cs | $desc | stages=${j.stageIds.size}: $stages"))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        // remove (not get): a dropped/raced start event must not NPE the
        // listener, and removing bounds the map (ADVICE r14)
        Option(starts.remove(j.jobId)).foreach { case (t0, d) =>
          System.out.println(
            f"[job] ${j.jobId}%4d ${(System.nanoTime()-t0)/1e9}%7.3fs  $d")
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
