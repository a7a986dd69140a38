package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Soft-EM E-step kernel for the unigram-LM trainer
  * ([[graft.operators.Unigram.trainSoft]]): forward–backward EXPECTED
  * piece counts over ALL segmentations of a (normalized single-word)
  * column — Kudo 2018's full E-step, where [[UnigramEncode]] is the
  * hard (Viterbi argmax) variant. Per word: a lattice of ≤
  * len × maxPieceLen edges, α/β passes, and per-edge posteriors
  * ec(edge) = α(pos)·p(piece)·β(pos+len) / α(end) — O(len ·
  * maxPieceLen) hash probes, independent of vocabulary size, with the
  * piece-probability table riding as a reference object (the
  * `BpeEncode` rank-table pattern).
  *
  * Cross-engine determinism — the properties that let a SQL oracle
  * replay the E-step bit-for-bit (q_t42), stated precisely because
  * float sums are usually where that dies:
  *  - edge weights are EXACT RATIONALS `count/total` (one IEEE double
  *    division — identical everywhere), never `exp(-cost)`: libm exp
  *    implementations differ in the last ulp across engines, divisions
  *    do not;
  *  - every α/β position sum is an EXPLICIT l-ascending chain of at
  *    most `maxPieceLen` terms starting from 0.0 (missing edges add
  *    +0.0, exact for the non-negative values here), so both engines
  *    associate identically — no engine-ordered SUM ever touches the
  *    lattice;
  *  - each edge posterior lands on the 1e-6 integer grid
  *    (`floor(((α·p)·β / α_end) · 1e6 + 0.5)`) BEFORE any cross-word
  *    aggregation, so corpus sums are exact BIGINT arithmetic in any
  *    partition order.
  *
  * Dynamic range: α decays like the word's total probability —
  * exp(-Σ piece nats) — and underflows +0.0 past ~745 summed nats
  * (double MIN subnormal), i.e. words of several hundred characters of
  * rare pieces. That is a LOUD failure here (α(end) == 0 throws,
  * naming the word), not a silent NaN: chunk such words first, or use
  * hard-EM whose integer DP has no such floor. Output: one
  * (piece, ec_micro) struct per DISTINCT piece used by the word's
  * lattice (within-word edge micros summed exactly). */
case class UnigramExpectedCounts(child: Expression,
                                 probs: java.util.HashMap[String, java.lang.Double],
                                 maxPieceLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = UnigramExpectedCounts.OutType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UnigramExpectedCounts.expected(input.asInstanceOf[UTF8String], probs,
      maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val probsRef = ctx.addReferenceObj("unigramProbs", probs,
      "java.util.HashMap<String, Double>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramExpectedCounts.expected(" +
        s"$c, $probsRef, $maxPieceLen);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramExpectedCounts = copy(child = newChild)

  override def prettyName: String = "unigram_expected_counts"
}

object UnigramExpectedCounts {

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("ec_micro", LongType, nullable = false))),
    containsNull = false)

  /** Per-word kernel (also the generated code's callee). */
  def expected(word: UTF8String,
               probs: java.util.HashMap[String, java.lang.Double],
               maxPieceLen: Int): ArrayData = {
    val w = word.toString
    val cps = w.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // lattice edges: (pos, len) -> probability, piece (vocab pieces only)
    val edgeP = Array.ofDim[Double](n, maxPieceLen + 1)
    val edgePiece = Array.ofDim[String](n, maxPieceLen + 1)
    var pos = 0
    while (pos < n) {
      var l = 1
      val lm = math.min(maxPieceLen, n - pos)
      while (l <= lm) {
        val piece = new String(cps, pos, l)
        val p = probs.get(piece)
        if (p != null) {
          edgeP(pos)(l) = p.doubleValue()
          edgePiece(pos)(l) = piece
        }
        l += 1
      }
      pos += 1
    }
    // forward: alpha(i) = sum_{l asc} alpha(i-l) * p(i-l, l)
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var i = 1
    while (i <= n) {
      var s = 0.0
      var l = 1
      val lm = math.min(maxPieceLen, i)
      while (l <= lm) {
        if (edgePiece(i - l)(l) != null) s += alpha(i - l) * edgeP(i - l)(l)
        else s += 0.0
        l += 1
      }
      alpha(i) = s
      i += 1
    }
    val an = alpha(n)
    if (an == 0.0) throw new IllegalStateException(
      s"unigram soft-EM: forward mass underflowed (or no segmentation) " +
        s"for word of ${n} code points starting '${w.take(24)}' — total " +
        "word cost past ~745 nats cannot be represented; chunk longer " +
        "words or train hard-EM")
    // backward: beta(i) = sum_{l asc} p(i, l) * beta(i+l)
    val beta = new Array[Double](n + 1)
    beta(n) = 1.0
    i = n - 1
    while (i >= 0) {
      var s = 0.0
      var l = 1
      val lm = math.min(maxPieceLen, n - i)
      while (l <= lm) {
        if (edgePiece(i)(l) != null) s += edgeP(i)(l) * beta(i + l)
        else s += 0.0
        l += 1
      }
      beta(i) = s
      i -= 1
    }
    // per-edge posterior, gridded to micro BEFORE any summation across
    // words; within-word same-piece edges sum exactly (Long)
    val acc = new java.util.LinkedHashMap[String, java.lang.Long]()
    pos = 0
    while (pos < n) {
      var l = 1
      val lm = math.min(maxPieceLen, n - pos)
      while (l <= lm) {
        val piece = edgePiece(pos)(l)
        if (piece != null) {
          val raw = ((alpha(pos) * edgeP(pos)(l)) * beta(pos + l)) / an
          val micro = math.floor(raw * 1e6 + 0.5).toLong
          if (micro != 0L) {
            val prev = acc.get(piece)
            acc.put(piece,
              java.lang.Long.valueOf(if (prev == null) micro
              else prev.longValue() + micro))
          }
        }
        l += 1
      }
      pos += 1
    }
    val out = new Array[Any](acc.size())
    val it = acc.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(UTF8String.fromString(e.getKey),
        e.getValue.longValue())
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, probs: Map[String, Double],
            maxPieceLen: Int): Column = {
    val m = new java.util.HashMap[String, java.lang.Double](probs.size * 2)
    probs.foreach { case (k, v) => m.put(k, java.lang.Double.valueOf(v)) }
    ColumnBridge.column(UnigramExpectedCounts(
      Cast(ColumnBridge.expression(c), StringType), m, maxPieceLen))
  }
}
