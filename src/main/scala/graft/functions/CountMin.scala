package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch over pre-hashed 64-bit keys — the bounded-state
  * heavy-hitter estimator (template/boilerplate detection on unbounded
  * corpora or streams, where an exact `groupBy(key).count` would keep one
  * state row per distinct key).
  *
  * Guarantees: estimate ≥ true count always (unconditional — every
  * update increments each row's counter). The classic CM bound
  * (estimate ≤ true count + εN with probability 1−δ for width = ⌈e/ε⌉,
  * depth = ⌈ln 1/δ⌉) assumes each depth's bucket function is an
  * independent draw from a pairwise-independent hash family; here the
  * per-depth buckets are fixed deterministic mixes (rotate + odd
  * multiply) of ONE xxhash64 value, an approximation of that family, so
  * treat the (ε, δ) figure as a heuristic sizing guide rather than a
  * proven bound. The sketch is a fixed depth×width Long table —
  * merge is element-wise addition, so partial aggregation combines
  * map-side and the shuffle carries one table per partition regardless of
  * key cardinality.
  *
  * Deterministic: row hashes come in pre-hashed (xxhash64 of the key);
  * per-depth mixing is a fixed odd-multiplier rotate — no RNG state.
  */
object CountMin {

  private[functions] def bucket(h: Long, d: Int, width: Int): Int = {
    // multiplier must stay ODD (odd base + even 2d) — an even multiplier
    // zeroes low bits and collapses coverage to width/2^k buckets
    val x = java.lang.Long.rotateLeft(h, d * 7 + 1) *
      (0x9E3779B97F4A7C15L + 2L * d)
    (((x % width) + width) % width).toInt
  }

  /** Typed Aggregator: input = xxhash64(key), buffer/output = flat
    * depth×width table. */
  class SketchAgg(depth: Int, width: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(depth > 0 && width > 0, "depth and width must be positive")
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      var d = 0
      while (d < depth) { b(d * width + bucket(h, d, width)) += 1L; d += 1 }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Aggregate column: `sketch(depth, width)(xxhash64-column)`. */
  def sketch(depth: Int, width: Int)(hashed: Column): Column =
    udaf(new SketchAgg(depth, width)).apply(hashed)

  /** Point estimate for one pre-hashed key from a collected table. */
  def estimate(table: Array[Long], depth: Int, width: Int, h: Long): Long = {
    require(table.length == depth * width, "table shape mismatch")
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val v = table(d * width + bucket(h, d, width))
      if (v < best) best = v
      d += 1
    }
    best
  }
}
