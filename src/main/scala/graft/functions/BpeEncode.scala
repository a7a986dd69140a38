package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Bpe

/** Whole-vocabulary BPE encoder as ONE codegen'd expression — the serve
  * path for REAL tokenizer vocabularies: `Bpe.encodeWord`'s
  * chained-literal-replace form builds k nested plan nodes, which
  * overflows the analyzer recursion and the 64 KB generated-method
  * limit near a thousand merges and costs O(k·len) scans per word; this
  * expression holds the vocabulary as a rank table referenced from
  * generated code (O(1) plan nodes at any k) and encodes each word by
  * the standard rank loop — repeatedly merge the LOWEST-RANK adjacent
  * pair present (all leftmost non-overlapping occurrences per step),
  * O(len²) hash probes per word, INDEPENDENT of vocabulary size.
  *
  * Semantics: identical to [[Bpe.encodeWord]] for any vocabulary
  * produced by `Bpe.train`/`Bpe.trainBatched` (spec-pinned, including a
  * multi-thousand-merge vocab). The equivalence needs the trained-vocab
  * invariant — every merged string is created by exactly one merge and
  * its components exist before it — which training guarantees by
  * construction; a hand-forged merge list that re-creates an EARLIER
  * merge's component could diverge (the rank loop would fire the
  * earlier merge on tokens the chained form never revisits). */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeEncode.rankTable(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      "java.util.HashMap<String, Integer>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode.encode($c, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeEncode {

  /** Merge list → rank table keyed "l␟r" (the separator can never occur
    * inside a token — Dedup.words strips control characters). */
  def rankTable(merges: Seq[(String, String)])
      : java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    var i = 0
    merges.foreach { case (l, r) =>
      m.putIfAbsent(l + Bpe.Sep + r, Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** Per-row kernel (also the generated code's callee): rank-loop BPE
    * over the word's codepoints. */
  def encode(word: UTF8String,
             ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val w = word.toString
    var tokens = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      tokens.add(new java.lang.StringBuilder(2).appendCodePoint(cp).toString)
      i += Character.charCount(cp)
    }
    var done = tokens.size() < 2
    while (!done) {
      // lowest-rank adjacent pair present in the word
      var bestRank = Integer.MAX_VALUE
      var j = 0
      while (j < tokens.size() - 1) {
        val r = ranks.get(tokens.get(j) + Bpe.Sep + tokens.get(j + 1))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        j += 1
      }
      if (bestRank == Integer.MAX_VALUE) done = true
      else {
        // merge ALL leftmost non-overlapping occurrences of that pair
        val next = new java.util.ArrayList[String](tokens.size())
        var p = 0
        while (p < tokens.size()) {
          if (p < tokens.size() - 1 && {
            val r = ranks.get(tokens.get(p) + Bpe.Sep + tokens.get(p + 1))
            r != null && r.intValue() == bestRank
          }) {
            next.add(tokens.get(p) + tokens.get(p + 1))
            p += 2
          } else {
            next.add(tokens.get(p))
            p += 1
          }
        }
        tokens = next
        if (tokens.size() < 2) done = true
      }
    }
    if (tokens.isEmpty)
      new GenericArrayData(Array[Any](UTF8String.fromString("")))
    else {
      val out = new Array[Any](tokens.size())
      var t = 0
      while (t < tokens.size()) {
        out(t) = UTF8String.fromString(tokens.get(t)); t += 1
      }
      new GenericArrayData(out)
    }
  }

  def apply(c: Column, merges: Seq[Bpe.Merge]): Column =
    ColumnBridge.column(BpeEncode(
      Cast(ColumnBridge.expression(c), StringType),
      merges.map(m => (m.l, m.r))))
}
