package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{RoundHalfDown, Rounding}

class RoundingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("halfDown matches java BigDecimal HALF_DOWN oracle") {
    // Note: 2.5e-3 etc. are not exact binary ties; the semantics follow the
    // double's exact expansion (like Python's Decimal(float)).
    val cases = Seq(1.2344999, 1.2345001, 39.1025, -39.1025, 0.0, 123.456789)
    for (x <- cases) {
      val expect = new java.math.BigDecimal(x)
        .setScale(3, java.math.RoundingMode.HALF_DOWN).doubleValue()
      assert(Rounding.halfDown(x, 3) == expect, s"x=$x")
    }
  }

  test("exact binary ties round DOWN (toward zero)") {
    // 0.0625 = 2^-4 is exactly representable; at scale 1 it is a true tie.
    assert(Rounding.halfDown(0.0625, 3) == 0.062)
    assert(Rounding.halfDown(-0.0625, 3) == -0.062)
    // HALF_UP control
    assert(Rounding.halfUp(0.0625, 3) == 0.063)
  }

  test("expression evaluates via codegen in a DataFrame plan") {
    val df = Seq(1.2345001, -7.7775, 39.1025).toDF("x")
      .select(RoundHalfDown(col("x"), 3).as("r"))
    val got = df.collect().map(_.getDouble(0)).toSeq
    val want = Seq(1.235, Rounding.halfDown(-7.7775, 3), Rounding.halfDown(39.1025, 3))
    assert(got == want)
  }

  test("SQL registration works") {
    RoundHalfDown.register(spark)
    val r = spark.sql("SELECT round_half_down(1.2345001, 3) AS r")
      .collect()(0).getDouble(0)
    assert(r == 1.235)
  }

  test("property: idempotent and within half-grid of input (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val x = (rnd.nextDouble() - 0.5) * 2e6
      val r = Rounding.halfDown(x, 3)
      assert(Rounding.halfDown(r, 3) == r, s"not idempotent at $x")
      assert(math.abs(r - x) <= 0.0005 + 1e-9, s"too far at $x")
    }
  }
}
