package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Tables

class SkewBucketSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("salted aggregation equals direct groupBy") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("total"))
      .orderBy("l_returnflag").collect()
    val salted = Skew.saltedCountSum(li, Seq("l_returnflag"), "l_quantity")
      .orderBy("l_returnflag").collect()
    assert(salted.length == direct.length)
    direct.zip(salted).foreach { case (d, s) =>
      assert(d.getString(0) == s.getString(0))
      assert(d.getAs[Long]("n") == s.getAs[Long]("n"))
      assert(math.abs(d.getAs[Double]("total") - s.getAs[Double]("total")) < 1e-6)
    }
  }

  test("salted join equals plain join") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, Seq("o_custkey"))
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect()
    val salted = Skew.saltedJoin(o, c, "o_custkey")
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect()
    assert(plain.length == salted.length)
    assert(plain.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey").write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_customer")
    // disable broadcast so the co-located (bucketed) path is what avoids
    // the shuffle, not a broadcast
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), Seq("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected bucket-co-located join without shuffle:\n$plan")
      assert(joined.count() == Tables.orders(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
