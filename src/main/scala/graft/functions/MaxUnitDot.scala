package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Max dot product of an array<double> column against a driver-side row
  * matrix, held as a REFERENCE OBJECT in the generated code — the
  * benchmark-eval-matrix kernel behind
  * [[graft.streaming.StreamContamination.flagSemantic]].
  *
  * The composable form (`aggregate(typedLit(matrix), MinValue,
  * (acc, ev) => greatest(acc, VectorDot(v, ev)))`) embeds the matrix as a
  * PLAN LITERAL: at real decontamination scale (the union of benchmark
  * suites — easily 1e5 rows × 768 dims ≈ 600 MB of doubles) that breaks
  * codegen and plan serialization long before executor memory matters.
  * This expression is the `BpeEncode` rank-table pattern instead: the
  * matrix crosses into generated code via `ctx.addReferenceObj` — O(1)
  * plan nodes at any matrix size, one tight primitive loop per row.
  *
  * Semantics are bit-for-bit the composable form's (spec-pinned,
  * including null vectors, zero rows, and dimension mismatches):
  *  - fold starts at `Double.MinValue` (the empty/never-matched value);
  *  - rows whose length differs from the input vector are SKIPPED, the
  *    exact `VectorDot` dim-mismatch null that `greatest` then ignores;
  *  - comparison is `java.lang.Double.compare` — Spark's DoubleType
  *    ordering (NaN greatest, -0.0 < 0.0) that `greatest` uses;
  *  - accumulation per row is the ascending-index primitive-double sum
  *    `VectorDot` generates;
  *  - a null input vector yields null (the composable form instead folds
  *    to MinValue there; both land on `contaminated = false` behind the
  *    `norm > 0` guard every caller applies — asserted in the same spec).
  */
case class MaxUnitDot(child: Expression, rows: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MaxUnitDot.maxDot(input.asInstanceOf[ArrayData], rows)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val rowsRef = ctx.addReferenceObj("maxDotRows", rows, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MaxUnitDot.maxDot($c, $rowsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): MaxUnitDot =
    copy(child = newChild)

  override def prettyName: String = "max_unit_dot"
}

object MaxUnitDot {

  /** Per-row kernel (also the generated code's callee). */
  def maxDot(v: ArrayData, rows: Array[Array[Double]]): Double = {
    val n = v.numElements()
    var best = Double.MinValue
    var r = 0
    while (r < rows.length) {
      val row = rows(r)
      if (row.length == n) { // dim mismatch = VectorDot's null, skipped
        var acc = 0.0
        var i = 0
        while (i < n) { acc += v.getDouble(i) * row(i); i += 1 }
        if (java.lang.Double.compare(acc, best) > 0) best = acc
      }
      r += 1
    }
    best
  }

  def apply(c: Column, rows: Array[Array[Double]]): Column =
    ColumnBridge.column(MaxUnitDot(
      Cast(ColumnBridge.expression(c), ArrayType(DoubleType)), rows))
}
