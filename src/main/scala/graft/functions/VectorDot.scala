package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two array<double> columns as a native codegen'd
  * Catalyst expression.
  *
  * The composable formulation `aggregate(zip_with(a, b, *), 0d, +)` is
  * semantically identical but higher-order functions are CodegenFallback —
  * interpreted per row with per-element closure dispatch — which measured
  * ~30µs/pair on 64-dim vectors in the near-dup pair loop. This expression
  * generates a tight primitive loop inside whole-stage codegen
  * (sub-µs/pair), which is what makes brute-force cosine re-ranking viable
  * as the verification stage of ANN/dedup pipelines at scale.
  *
  * Accumulation order is ascending index, matching both the HOF
  * formulation and the DuckDB oracle's unnest-order sum.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // nullable regardless of children: mismatched dimensions yield null
  // (a truncated dot product would be a silently wrong similarity)
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

object VectorDot {
  // Unconditional Cast: children may be unresolved at Column-build time
  // (no dataType yet); a trivial array<double>→array<double> cast is
  // erased by the optimizer.
  private def toDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(
      toDoubleArray(ColumnBridge.expression(a)),
      toDoubleArray(ColumnBridge.expression(b))))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "vector_dot",
      exprs => VectorDot(toDoubleArray(exprs.head), toDoubleArray(exprs(1))))
}
