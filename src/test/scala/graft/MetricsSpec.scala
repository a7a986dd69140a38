package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Metrics

class MetricsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def aucOf(rows: Seq[(Double, Long)]): (Long, Long, Option[Double]) = {
    val r = Metrics.auc(rows.toDF("score", "y"), col("score"), col("y"))
      .collect()(0)
    (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
      if (r.isNullAt(r.fieldIndex("auc"))) None
      else Some(r.getAs[Double]("auc")))
  }

  test("auc: hand-computed with a tie at half credit") {
    // pos-neg pairs: (0.9,0.8-)win (0.9,0.1)win (0.8+,0.8-)tie=0.5
    // (0.8+,0.1)win -> 3.5/4 = 0.875
    assert(aucOf(Seq((0.9, 1L), (0.8, 0L), (0.8, 1L), (0.1, 0L))) ==
      (2L, 2L, Some(0.875)))
  }

  test("auc: perfect separation is 1.0, inverted is 0.0, all-tied 0.5") {
    assert(aucOf(Seq((0.9, 1L), (0.8, 1L), (0.2, 0L), (0.1, 0L)))._3 ==
      Some(1.0))
    assert(aucOf(Seq((0.1, 1L), (0.2, 1L), (0.8, 0L), (0.9, 0L)))._3 ==
      Some(0.0))
    assert(aucOf(Seq((0.5, 1L), (0.5, 0L), (0.5, 1L), (0.5, 0L)))._3 ==
      Some(0.5))
  }

  test("auc: single-class input is undefined (null), not 0.5") {
    assert(aucOf(Seq((0.9, 1L), (0.1, 1L))) == (2L, 0L, None))
    assert(aucOf(Seq((0.9, 0L), (0.1, 0L))) == (0L, 2L, None))
  }
}
