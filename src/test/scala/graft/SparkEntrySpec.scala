package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: every declared query plans and executes on the
  * smallest scale factor, oracle keys ⊆ query keys, entry() non-empty.
  * (Value-level correctness is the Verify + DuckDB selfcheck path.) */
class SparkEntrySpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
