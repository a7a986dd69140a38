package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** HLL register-array cardinality estimate as a native codegen'd
  * Catalyst expression — the engine-side twin of the scalar
  * [[Hll.estimate]] (SAME kernel invoked, so driver and engine can
  * never drift). Replaces the repo's only `udf(...)` wrappers: a Scala
  * UDF forces a closure dispatch + catalyst↔Scala converters per row,
  * which shows up when estimating millions of grouped sketches; this
  * stays inside whole-stage codegen like the other kernels
  * ([[CharEntropy]] is the template). Null registers → null. */
case class HllEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Hll.estimate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hll.estimate($c)")

  override protected def withNewChildInternal(
      newChild: Expression): HllEstimate = copy(child = newChild)

  override def prettyName: String = "hll_estimate"
}

object HllEstimate {
  def apply(c: Column): Column =
    ColumnBridge.column(HllEstimate(ColumnBridge.expression(c)))
}

/** Union (element-wise max) estimate of two register arrays as ONE
  * codegen'd expression — the per-pair kernel of
  * [[Hll.pairwiseOverlap]] without materializing the merged registers
  * as a column. Same scalar kernel as [[Hll.unionEstimate]] (mismatched
  * register lengths throw, like the scalar). */
case class HllUnionEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Hll.unionEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Hll.unionEstimate($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllUnionEstimate =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hll_union_estimate"
}

object HllUnionEstimate {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(HllUnionEstimate(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
