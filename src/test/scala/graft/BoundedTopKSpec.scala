package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BoundedTopK
import graft.operators.GroupTopN

class BoundedTopKSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // keys 0..6, values deliberately shuffled across 8 partitions so the
  // partial/merge path (serialize + deserialize included) really runs
  private lazy val df = spark.range(0, 1000, 1, 8).toDF("id")
    .withColumn("key", pmod(col("id") * 37 % 1000, lit(7)))
    .withColumn("v", pmod(col("id") * 7919, lit(1000)))

  test("matches the sort-slice reference on every key") {
    val item = struct(col("v"), col("id"))
    val got = GroupTopN.smallestPerKey(df, "key", item, 5)
      .select(col("key"), expr("transform(_top, x -> x.id)").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val want = df.groupBy("key")
      .agg(expr("slice(array_sort(collect_list(struct(v, id))), 1, 5)").as("_top"))
      .select(col("key"), expr("transform(_top, x -> x.id)").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got == want)
    assert(got.values.forall(_.size == 5))
  }

  test("duplicate items are kept, short groups return all ascending") {
    val small = Seq((1L, 3L), (1L, 3L), (1L, 1L), (2L, 9L)).toDF("key", "v")
    val got = GroupTopN.smallestPerKey(small, "key",
        struct(col("v")), 10)
      .select(col("key"), expr("transform(_top, x -> x.v)").as("vs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got(1L) == Seq(1L, 3L, 3L))
    assert(got(2L) == Seq(9L))
  }

  test("plan: ONE exchange, object hash aggregate, no window") {
    val item = struct(col("v"), col("id"))
    val plan = GroupTopN.smallestPerKey(df, "key", item, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "no window operator expected")
    assert(plan.contains("ObjectHashAggregate"), s"expected object agg in:\n$plan")
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"expected exactly one exchange in:\n$plan")
  }

  test("atomic (non-struct) child is rejected at analysis time") {
    val e = intercept[Exception] {
      df.groupBy("key").agg(BoundedTopK.smallestK(col("v"), 3)).collect()
    }
    assert(e.getMessage.contains("struct"), s"unexpected: ${e.getMessage}")
  }

  test("null items are skipped (collect_list semantics)") {
    val withNulls = Seq((1L, Some(5L)), (1L, None), (1L, Some(2L)))
      .toDF("key", "v")
    val got = withNulls.groupBy("key")
      .agg(BoundedTopK.smallestK(when(col("v").isNotNull,
        struct(col("v"))), 10).as("_top"))
      .select(expr("transform(_top, x -> x.v)").as("vs"))
      .collect()(0).getSeq[Long](0).toSeq
    assert(got == Seq(2L, 5L))
  }
}
