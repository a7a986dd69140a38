package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Banded random-hyperplane LSH signature of an array<double> vector —
  * band b's value packs the sign bits of planes [b·r, (b+1)·r) into a
  * long (r = planes/bands) — with the hyperplane matrix held as a
  * REFERENCE OBJECT in the generated code.
  *
  * The composable form ([[graft.operators.Dedup.bandValues]]'s original
  * per-plane `when(dot(vec, typedlit(plane)) >= 0, …)` reduce) builds
  * O(planes) plan nodes each dragging a dim-sized literal: past ~100
  * planes the generated projection method exceeds the 64 KB JVM limit
  * and the whole stage silently falls back to interpreted eval — at
  * S-curve configs like (270, 15) that is exactly the hot path dying at
  * scale. Here the matrix crosses via `ctx.addReferenceObj` (O(1) plan
  * nodes at any plane count) and each row pays one tight
  * planes×dim primitive loop.
  *
  * Semantics are those of the composable form for every row the dedup
  * callers can feed it (they all filter `norm > 0` first, which drops
  * null vectors): ascending-index double dot accumulation, `>= 0` sign
  * test, bit j of band b set iff plane b·r+j is non-negative. A vector
  * whose dimension differs from the hyperplanes' fails LOUDLY (the
  * raise_error contract of the original — silently bucketing at 0 would
  * degrade to all-pairs or return zero pairs with no error). */
case class BandBits(child: Expression, hp: Array[Array[Double]], bands: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    BandBits.compute(input.asInstanceOf[ArrayData], hp, bands)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val hpRef = ctx.addReferenceObj("bandHyperplanes", hp, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BandBits.compute($c, $hpRef, $bands);")
  }

  override protected def withNewChildInternal(newChild: Expression): BandBits =
    copy(child = newChild)

  override def prettyName: String = "band_bits"
}

object BandBits {

  /** Per-row kernel (also the generated code's callee). */
  def compute(v: ArrayData, hp: Array[Array[Double]],
              bands: Int): ArrayData = {
    val dim = hp(0).length
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"embedding dimension ${v.numElements()} != hyperplane dimension $dim")
    val r = hp.length / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var packed = 0L
      var j = 0
      while (j < r) {
        val w = hp(b * r + j)
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += v.getDouble(i) * w(i); i += 1 }
        if (acc >= 0) packed |= 1L << j
        j += 1
      }
      out(b) = packed
      b += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, hp: Array[Array[Double]], bands: Int): Column =
    ColumnBridge.column(BandBits(
      Cast(ColumnBridge.expression(c), ArrayType(DoubleType)), hp, bands))
}
