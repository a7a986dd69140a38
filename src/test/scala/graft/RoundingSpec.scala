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

  test("charEntropy: known values, unicode codepoints, empty null, codegen") {
    import graft.functions.CharEntropy
    val df = Seq(
      ("aaaa", 1L),        // one symbol → H = 0
      ("abab", 2L),        // two equiprobable → H = 1
      ("abcd", 3L),        // four equiprobable → H = 2
      ("aab", 4L),         // H = log2(3) − (2·1)/3
      ("", 5L),            // empty → null
      ("日本日本", 6L)      // non-ASCII codepoints, two equiprobable → 1
    ).toDF("s", "id")
    val got = df.select(col("id"), CharEntropy(col("s")).as("h"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(0.0))
    assert(got(2L).contains(1.0))
    assert(got(3L).contains(2.0))
    val expect = math.log(3.0) / math.log(2.0) -
      (2.0 * (math.log(2.0) / math.log(2.0))) / 3.0
    assert(math.abs(got(4L).get - expect) < 1e-12)
    assert(got(5L).isEmpty, "empty string must be null")
    assert(got(6L).contains(1.0))
    // evaluates inside whole-stage codegen (no interpreted fallback row);
    // repartition blocks ConvertToLocalRelation from folding the project,
    // and the plan is read AFTER execution so AQE has finalized it
    val q2 = df.repartition(1).select(CharEntropy(col("s")).as("h"))
    q2.collect()
    val plan = q2.queryExecution.executedPlan.toString
    // the `*(n)` star prefix is the WholeStageCodegen marker in toString
    assert(plan.contains("*(1) Project [char_entropy"), plan)
    // SQL registration
    CharEntropy.register(spark)
    assert(spark.sql("SELECT char_entropy('abab') AS h")
      .collect()(0).getDouble(0) == 1.0)
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
