package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits/char) of a string's codepoint distribution as a
  * native codegen'd Catalyst expression — the classic cheap quality
  * signal: low-entropy text is repetitive boilerplate/filler (a doc of
  * "aaaa…" scores 0), high entropy flags encrypted/binary junk pasted
  * into text; curation recipes band-pass it (cf. the heuristic filters
  * in C4/Gopher-class pipelines).
  *
  * H = log2(n) − (Σ_k c_k·log2(c_k))/n over codepoint counts c_k — the
  * numerically stable factorization (no per-char division before the
  * logs). DETERMINISM: the Σ accumulates in ascending-codepoint order
  * (TreeMap iteration), which the DuckDB oracle replays as a
  * `list(count ORDER BY char)` fold — binary collation orders single
  * UTF-8 chars by codepoint, so both engines sum the same doubles in
  * the same order. Empty/null strings yield null (no distribution).
  *
  * Codegen: a higher-order-function formulation (explode → groupBy char)
  * would SHUFFLE once per document corpus-wide; this stays one map-side
  * call per row inside whole-stage codegen (the generated code calls the
  * static kernel — per-row char histogram, no closure dispatch). */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (s.numChars() == 0) null else CharEntropy.compute(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |if ($a.numChars() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.CharEntropy.compute($a);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)

  override def prettyName: String = "char_entropy"
}

object CharEntropy {
  private val Ln2 = math.log(2.0)

  /** Per-row kernel (also the generated code's callee via the static
    * forwarder): codepoint histogram in a TreeMap, Σ in key order. */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    val counts = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      i += Character.charCount(cp)
      n += 1L
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      acc += c * (math.log(c) / Ln2)
    }
    math.log(n.toDouble) / Ln2 - acc / n
  }

  def apply(c: Column): Column =
    ColumnBridge.column(CharEntropy(
      Cast(ColumnBridge.expression(c), StringType)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "char_entropy",
      exprs => CharEntropy(Cast(exprs.head, StringType)))
}
