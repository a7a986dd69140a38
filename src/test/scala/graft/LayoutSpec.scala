package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Layout

class LayoutSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("interleave: known Morton codes") {
    // x=0b11, y=0b01 → z = y1 x1 y0 x0 = 0 1 1 1 = 7
    val df = Seq((3L, 1L)).toDF("x", "y")
      .select(Layout.interleave(Seq(col("x"), col("y")), bits = 2).as("z"))
    assert(df.collect()(0).getLong(0) == 7L)
  }

  test("z-order write keeps BOTH columns' per-file ranges tight") {
    // two independent uniform dims — the adversarial case for 1-D sorting
    val n = 4096
    val df = spark.range(n).toDF("id")
      .withColumn("x", pmod(col("id") * 7919, lit(n.toLong)).cast("double"))
      .withColumn("y", pmod(col("id") * 104729, lit(n.toLong)).cast("double"))
    val dir = java.nio.file.Files.createTempDirectory("zorder")
    val files = 16
    Layout.zOrdered(df, Seq(("x", 0.0, n - 1.0), ("y", 0.0, n - 1.0)), files)
      .write.mode("overwrite").parquet(s"$dir/z")
    df.repartitionByRange(files, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/linear")
    def avgSpan(path: String, c: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("span"))
        .select("span").collect().map(_.getDouble(0))
      spans.sum / spans.length
    }
    // linear layout: x tight, y spans ~everything
    assert(avgSpan(s"$dir/linear", "y") > 0.9 * n)
    // z-order: BOTH dims well under the full range
    val zx = avgSpan(s"$dir/z", "x")
    val zy = avgSpan(s"$dir/z", "y")
    assert(zx < 0.5 * n, s"x span $zx not tightened")
    assert(zy < 0.5 * n, s"y span $zy not tightened")
    // row content untouched by layout
    assert(spark.read.parquet(s"$dir/z").count() == n)
    assert(spark.read.parquet(s"$dir/z").agg(sum("x")).collect()(0).getDouble(0)
      == df.agg(sum("x")).collect()(0).getDouble(0))
  }

  test("bucketed tables join with ZERO exchanges (co-located sort-merge)") {
    val dir = "/root/testdata/sf0.001"
    Layout.writeBucketed(
      spark.read.parquet(s"$dir/lineitem.parquet"), "li_b", "l_orderkey", 4)
    Layout.writeBucketed(
      spark.read.parquet(s"$dir/orders.parquet"), "ord_b", "o_orderkey", 4)
    val (bcast, aqe) = (spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      spark.conf.get("spark.sql.adaptive.enabled"))
    try {
      // force the sort-merge path: broadcast would hide the exchange
      // question entirely, AQE re-plans mid-flight
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val j = spark.table("li_b").join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it returns the same rows as the plain shuffled join
      val expected = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("zOrderedByStats derives bounds in one aggregate") {
    val df = Seq((1.0, 10.0), (5.0, 20.0), (9.0, 30.0)).toDF("a", "b")
    val out = Layout.zOrderedByStats(df, Seq("a", "b"), numFiles = 1)
    assert(out.count() == 3)
  }

  test("degenerate span (constant column) clamps instead of dividing by zero") {
    val df = Seq((1.0, 1.0), (2.0, 1.0)).toDF("a", "b")
    val out = Layout.zOrdered(df, Seq(("a", 1.0, 2.0), ("b", 1.0, 1.0)), 1)
    assert(out.count() == 2)
  }
}
