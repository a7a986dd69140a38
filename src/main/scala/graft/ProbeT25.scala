package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeT25 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
      .withColumn("y", (col("lang") === "en").cast("long"))
    val fx0 = graft.operators.Classifier.hashedFeatures(df, "doc_id", "text", 256)
      .union(df.select(col("doc_id").as("id"), lit(256L).as("b"), lit(1L).as("x")))
      .join(df.select(col("doc_id").as("id"),
        greatest(graft.operators.TextStats.wordCount(col("text")), lit(1L)).as("n"),
        col("y").cast("long").as("y")), Seq("id"))
    val fx = fx0.repartition(col("id")).persist()
    fx.count()
    println("=== fx rdd partitions: " + fx.rdd.getNumPartitions)
    val w = new Array[Long](257)
    val wLit = typedlit(w.toSeq)
    val perDoc = fx
      .withColumn("_zn", col("x") * element_at(wLit, (col("b") + 1).cast("int")))
      .groupBy("id").agg(sum(col("_zn")).as("_z"),
        first(col("n")).as("_n"), first(col("y")).as("_y"))
      .withColumn("_p", lit(1.0) / (lit(1.0) +
        exp(-(col("_z").cast("double") / (col("_n").cast("double") * lit(1e6))))))
      .select(col("id"),
        floor((col("_p") - col("_y").cast("double")) * lit(1e6) + lit(0.5)).as("_r"))
    val grad = fx.join(perDoc, Seq("id"))
      .groupBy("b").agg(sum(col("_r") * col("x")).as("g"))
    println(grad.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    // time 30 iterations of collect to compare directly
    val t0 = System.nanoTime()
    (1 to 30).foreach { _ => grad.collect() }
    println(f"=== 30 iters: ${(System.nanoTime()-t0)/1e9}%.2fs")
    spark.stop()
  }
}
