package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine parity helpers shared by the query packs.
  *
  * Order-independent money sum: the corpus' money/value doubles sit
  * EXACTLY on the 2-dp grid (verified over every sf), so casting each
  * value to DECIMAL(20,2) is lossless, the decimal addition is exact in
  * any order, and the cast back to double is deterministic. A plain
  * double sum folds in shuffle order and drifts a last-ulp per run —
  * observed as a 6-dp rounding flip in q_a1's avg at sf0.1. Every
  * oracled sum/avg over such a column must use this pair (Spark side +
  * SQL mirror); integral-valued doubles (quantities) are exact under
  * any order and need nothing. */
object Parity {
  def moneySum(c: Column): Column =
    sum(c.cast("decimal(20,2)")).cast("double")
  def moneySumSql(x: String): String =
    s"CAST(sum(CAST($x AS DECIMAL(20,2))) AS DOUBLE)"
}
