package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-word LIKELIHOOD-LOSS contributions of removing each candidate
  * piece — the E-side of Kudo 2018's PRUNE step (the counterpart of
  * [[UnigramExpectedCounts]]' E-step): for every DISTINCT multi-piece x
  * in the word's lattice, loss(x) = ln α_end − ln α_end^{−x}, where
  * α^{−x} is the forward mass recomputed with x's edges removed — how
  * many nats of word probability die if the vocabulary loses x. Pieces
  * whose removal costs the corpus least get pruned; frequency rank
  * (the [[graft.operators.Unigram.train]]/`trainSoft` default) is the
  * common simplification, and this kernel closes that last stated
  * divergence from the published algorithm.
  *
  * Cross-engine determinism, same contract as [[UnigramExpectedCounts]]:
  * exact-rational edge weights (c/total — no exp), every forward sum an
  * explicit l-ascending chain, and the loss grids to micro-nats per
  * (word, piece) — `floor((ln(α) − ln(α−x)) · 1e6 + 0.5)` with two ln
  * calls and one subtraction in that exact order (ln on identical
  * doubles is the one libm call this repo's oracles already rely on,
  * `Unigram.costMicro`) — BEFORE any cross-word aggregation, so corpus
  * sums are exact BIGINT arithmetic.
  *
  * Removal can only REMOVE lattice paths, so α^{−x} < α whenever x is
  * present and the gridded loss is ≥ 0; the single-character fallback
  * keeps α^{−x} > 0 for every multi x (only α itself can underflow —
  * same loud ~745-nat failure as the E-step kernel). Single-character
  * pieces are never candidates (the alphabet is never pruned). */
case class UnigramPruneLoss(child: Expression,
                            probs: java.util.HashMap[String, java.lang.Double],
                            maxPieceLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = UnigramPruneLoss.OutType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UnigramPruneLoss.losses(input.asInstanceOf[UTF8String], probs,
      maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val probsRef = ctx.addReferenceObj("unigramProbs", probs,
      "java.util.HashMap<String, Double>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramPruneLoss.losses(" +
        s"$c, $probsRef, $maxPieceLen);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramPruneLoss = copy(child = newChild)

  override def prettyName: String = "unigram_prune_loss"
}

object UnigramPruneLoss {

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("loss_micro", LongType, nullable = false))),
    containsNull = false)

  /** Per-word kernel (also the generated code's callee). */
  def losses(word: UTF8String,
             probs: java.util.HashMap[String, java.lang.Double],
             maxPieceLen: Int): ArrayData = {
    val w = word.toString
    val cps = w.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val edgeP = Array.ofDim[Double](n, maxPieceLen + 1)
    val edgePiece = Array.ofDim[String](n, maxPieceLen + 1)
    val multis = new java.util.LinkedHashSet[String]()
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
          if (l > 1) multis.add(piece) // l counts code points (pieceLen)
        }
        l += 1
      }
      pos += 1
    }
    // forward mass with x's edges excluded (x == null -> full lattice);
    // identical op order to UnigramExpectedCounts' forward pass
    def forward(excluded: String): Double = {
      val alpha = new Array[Double](n + 1)
      alpha(0) = 1.0
      var i = 1
      while (i <= n) {
        var s = 0.0
        var l = 1
        val lm = math.min(maxPieceLen, i)
        while (l <= lm) {
          val piece = edgePiece(i - l)(l)
          if (piece != null && piece != excluded)
            s += alpha(i - l) * edgeP(i - l)(l)
          else s += 0.0
          l += 1
        }
        alpha(i) = s
        i += 1
      }
      alpha(n)
    }
    val an = forward(null)
    if (an == 0.0) throw new IllegalStateException(
      s"unigram prune loss: forward mass underflowed (or no " +
        s"segmentation) for word of ${n} code points starting " +
        s"'${w.take(24)}' — chunk longer words first")
    val lnAn = math.log(an)
    val out = new Array[Any](multis.size())
    val it = multis.iterator()
    var j = 0
    while (it.hasNext) {
      val x = it.next()
      val anx = forward(x)
      // chars always segment the word, so anx > 0; removal only removes
      // paths, so lnAn - ln(anx) >= 0 before the grid
      val micro = math.floor((lnAn - math.log(anx)) * 1e6 + 0.5).toLong
      out(j) = InternalRow(UTF8String.fromString(x), micro)
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, probs: Map[String, Double],
            maxPieceLen: Int): Column = {
    val m = new java.util.HashMap[String, java.lang.Double](probs.size * 2)
    probs.foreach { case (k, v) => m.put(k, java.lang.Double.valueOf(v)) }
    ColumnBridge.column(UnigramPruneLoss(
      Cast(ColumnBridge.expression(c), StringType), m, maxPieceLen))
  }
}
