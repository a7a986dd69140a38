package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) Viterbi segmentation of a
  * (normalized single-word) column — the serve path of
  * [[graft.operators.Unigram]], and the E-step kernel of its
  * Viterbi-EM trainer. The piece-cost table rides as a REFERENCE
  * OBJECT (the `BpeEncode` rank-table pattern): O(1) plan nodes at any
  * vocabulary size, one suffix-DP + forward-walk loop per word,
  * O(len · maxPieceLen) hash probes — independent of vocabulary size.
  *
  * Costs are INTEGER-GRID negative log probabilities (micro-nats:
  * `floor(-ln(p) · 1e6 + 0.5)`, see `Unigram.costMicro`) so the argmin
  * segmentation — and with it the whole EM trajectory — is
  * engine-bit-identical: a SQL oracle replaying the same DP over BIGINT
  * costs picks the same pieces, with no float drift to accumulate
  * across EM rounds.
  *
  * Determinism: the total cost of a segmentation is the sum of its
  * piece costs; the walk picks, left to right, the piece minimizing
  * (cost + suffix-optimal cost), ties broken by SHORTER piece (two
  * distinct pieces at one position always differ in length). A
  * character absent from the vocabulary segments as itself at
  * `unkCost` (serve-time novel characters; during training every
  * character is in the vocabulary, so the E-step never pays it).
  * Positions are Unicode code points, matching SQL `substr`. */
case class UnigramEncode(child: Expression,
                         costs: java.util.HashMap[String, java.lang.Long],
                         maxPieceLen: Int, unkCost: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UnigramEncode.segment(input.asInstanceOf[UTF8String], costs,
      maxPieceLen, unkCost)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val costsRef = ctx.addReferenceObj("unigramCosts", costs,
      "java.util.HashMap<String, Long>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramEncode.segment($c, $costsRef, " +
        s"$maxPieceLen, ${unkCost}L);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramEncode = copy(child = newChild)

  override def prettyName: String = "unigram_encode"
}

object UnigramEncode {

  /** Per-word kernel (also the generated code's callee): suffix-optimal
    * DP then forward walk, all in Long arithmetic. */
  def segment(word: UTF8String,
              costs: java.util.HashMap[String, java.lang.Long],
              maxPieceLen: Int, unkCost: Long): ArrayData = {
    val w = word.toString
    // code-point alphabet: SQL substr counts characters, not UTF-16 units
    val cps = w.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    def pieceAt(pos: Int, len: Int): String =
      new String(cps, pos, len)
    def costOf(piece: String, len: Int): Long = {
      val c = costs.get(piece)
      if (c != null) c.longValue()
      else if (len == 1) unkCost
      else Long.MaxValue // not a piece
    }
    val Inf = Long.MaxValue / 4
    val bestFrom = new Array[Long](n + 1)
    bestFrom(n) = 0L
    var i = n - 1
    while (i >= 0) {
      var best = Inf
      var l = 1
      val lm = math.min(maxPieceLen, n - i)
      while (l <= lm) {
        val c = costOf(pieceAt(i, l), l)
        if (c < Inf && bestFrom(i + l) < Inf) {
          val t = c + bestFrom(i + l)
          if (t < best) best = t
        }
        l += 1
      }
      bestFrom(i) = best
      i -= 1
    }
    val out = new java.util.ArrayList[Any](n)
    var pos = 0
    while (pos < n) {
      var bestTotal = Inf
      var bestLen = 1
      var l = 1
      val lm = math.min(maxPieceLen, n - pos)
      while (l <= lm) {
        val c = costOf(pieceAt(pos, l), l)
        if (c < Inf && bestFrom(pos + l) < Inf) {
          val t = c + bestFrom(pos + l)
          if (t < bestTotal) { bestTotal = t; bestLen = l } // tie → shorter
        }
        l += 1
      }
      out.add(UTF8String.fromString(pieceAt(pos, bestLen)))
      pos += bestLen
    }
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column, costs: Map[String, Long], maxPieceLen: Int,
            unkCost: Long): Column = {
    val m = new java.util.HashMap[String, java.lang.Long](costs.size * 2)
    costs.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    ColumnBridge.column(UnigramEncode(
      Cast(ColumnBridge.expression(c), StringType), m, maxPieceLen, unkCost))
  }
}
