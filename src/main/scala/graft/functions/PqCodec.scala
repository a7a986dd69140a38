package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization codec expressions with the codebook bound ONCE
  * per plan as a reference object (`ctx.addReferenceObj`) — never
  * unrolled into literal subtrees.
  *
  * The literal formulation (a `least()` over codebookSize
  * struct(dot, code) candidates per subspace, every codeword a
  * `typedlit`) builds an expression tree of m·codebookSize dot
  * subtrees: 256 at the toy size (m=16, k=16) and 4,096 at the
  * standard PQ byte code (k=256) — past any sane codegen/JIT budget,
  * and the measured 32 s q_s4 bench cost was plan compilation of that
  * tree, not data. Here the codebook rides the expression as a plain
  * `double[]`; the serialized plan (itself torrent-broadcast per stage
  * by Spark) carries it once, and codegen emits a tight three-deep
  * loop — constant code size at ANY codebook size.
  *
  * Float-math parity (the DuckDB oracle replays every stage):
  *  - subspace dots accumulate in ascending element order (the
  *    VectorDot convention == DuckDB list_sum over an ascending range);
  *  - encode argmin compares `-(dot − ‖c‖²/2) + 0.0` (the +0.0
  *    canonicalizes −0.0, mirroring topKPerQuery) with strict `<`, so
  *    the SMALLEST code wins exact ties — identical to the previous
  *    least(struct(negs, code)) ordering;
  *  - ADC sums LUT entries in ascending subspace order (a left fold,
  *    == the previous `reduce(_ + _)` and DuckDB's list_sum).
  */
object PqCodec {

  private def toDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  /** Encode column: normalized vector → array<int> of m codes. */
  def encodeCol(vec: Column, cbFlat: Array[Double], halfFlat: Array[Double],
                m: Int, codebookSize: Int, dsub: Int): Column =
    ColumnBridge.column(PqEncodeExpr(
      toDoubleArray(ColumnBridge.expression(vec)),
      cbFlat, halfFlat, m, codebookSize, dsub))

  /** Query LUT column: normalized query vector → flat array<double> of
    * length m·codebookSize; lut[j·k + c] = q_subj · cb(j)(c). */
  def lutCol(vec: Column, cbFlat: Array[Double],
             m: Int, codebookSize: Int, dsub: Int): Column =
    ColumnBridge.column(PqLutExpr(
      toDoubleArray(ColumnBridge.expression(vec)),
      cbFlat, m, codebookSize, dsub))

  /** ADC score column: Σ_j lut[j·k + codes[j]] (ascending j). */
  def adcCol(lut: Column, codes: Column, codebookSize: Int): Column =
    ColumnBridge.column(PqAdcExpr(
      ColumnBridge.expression(lut), ColumnBridge.expression(codes),
      codebookSize))

  /** Per-LIST encode: like [[encodeCol]] but `cbFlat`/`halfFlat` stack
    * every inverted list's codebook and `listIdx` (int column) selects
    * the slab — the residual-IVF-PQ variant, where each list quantizes
    * its own residual cloud. */
  def encodeListCol(vec: Column, listIdx: Column, cbFlat: Array[Double],
                    halfFlat: Array[Double], m: Int, codebookSize: Int,
                    dsub: Int): Column =
    ColumnBridge.column(PqEncodeListExpr(
      toDoubleArray(ColumnBridge.expression(vec)),
      ColumnBridge.expression(listIdx), cbFlat, halfFlat, m, codebookSize,
      dsub))

  /** Per-LIST query LUT: like [[lutCol]] against `listIdx`'s slab of the
    * stacked codebook — computed once per (query, probed list) pair. */
  def lutListCol(vec: Column, listIdx: Column, cbFlat: Array[Double],
                 m: Int, codebookSize: Int, dsub: Int): Column =
    ColumnBridge.column(PqLutListExpr(
      toDoubleArray(ColumnBridge.expression(vec)),
      ColumnBridge.expression(listIdx), cbFlat, m, codebookSize, dsub))
}

/** argmin-encode a normalized vector against the bound codebook.
  * cbFlat((j·k + c)·dsub + t) = codeword t-th component;
  * halfFlat(j·k + c) = ‖codeword‖²/2 (driver-precomputed, ascending
  * left-fold sum — same fold the oracle replays). Null on null input or
  * a dimension mismatch (a truncated encode would be silently wrong —
  * the VectorDot convention). */
case class PqEncodeExpr(child: Expression, cbFlat: Array[Double],
                        halfFlat: Array[Double], m: Int, codebookSize: Int,
                        dsub: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.PositiveInfinity
      var bestCode = 0
      var c = 0
      while (c < codebookSize) {
        var acc = 0.0
        val base = (j * codebookSize + c) * dsub
        var t = 0
        while (t < dsub) { acc += v.getDouble(j * dsub + t) * cbFlat(base + t); t += 1 }
        val negs = -(acc - halfFlat(j * codebookSize + c)) + 0.0
        if (negs < best) { best = negs; bestCode = c }
        c += 1
      }
      codes(j) = bestCode
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCb", cbFlat, "double[]")
    val half = ctx.addReferenceObj("pqHalf", halfFlat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val t = ctx.freshName("t"); val acc = ctx.freshName("acc")
      val best = ctx.freshName("best"); val bestCode = ctx.freshName("bestCode")
      val negs = ctx.freshName("negs"); val codes = ctx.freshName("codes")
      val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() != ${m * dsub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    int $bestCode = 0;
         |    for (int $c = 0; $c < $codebookSize; $c++) {
         |      double $acc = 0.0;
         |      int $base = ($j * $codebookSize + $c) * $dsub;
         |      for (int $t = 0; $t < $dsub; $t++) {
         |        $acc += $v.getDouble($j * $dsub + $t) * $cb[$base + $t];
         |      }
         |      double $negs = -($acc - $half[$j * $codebookSize + $c]) + 0.0;
         |      if ($negs < $best) { $best = $negs; $bestCode = $c; }
         |    }
         |    $codes[$j] = $bestCode;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** Per-query ADC lookup table against the bound codebook, flattened to
  * array<double> of m·codebookSize partial dots. */
case class PqLutExpr(child: Expression, cbFlat: Array[Double], m: Int,
                     codebookSize: Int, dsub: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub) return null
    val lut = new Array[Double](m * codebookSize)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < codebookSize) {
        var acc = 0.0
        val base = (j * codebookSize + c) * dsub
        var t = 0
        while (t < dsub) { acc += v.getDouble(j * dsub + t) * cbFlat(base + t); t += 1 }
        lut(j * codebookSize + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCb", cbFlat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val t = ctx.freshName("t"); val acc = ctx.freshName("acc")
      val lut = ctx.freshName("lut"); val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() != ${m * dsub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $lut = new double[${m * codebookSize}];
         |  for (int $j = 0; $j < $m; $j++) {
         |    for (int $c = 0; $c < $codebookSize; $c++) {
         |      double $acc = 0.0;
         |      int $base = ($j * $codebookSize + $c) * $dsub;
         |      for (int $t = 0; $t < $dsub; $t++) {
         |        $acc += $v.getDouble($j * $dsub + $t) * $cb[$base + $t];
         |      }
         |      $lut[$j * $codebookSize + $c] = $acc;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($lut);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
  override def prettyName: String = "pq_lut"
}

/** ADC score: ascending-j left-fold of LUT lookups — m array reads +
  * adds per (query, code-row) pair, the whole point of PQ. Null on null
  * inputs or when the LUT length does not cover the code array. */
case class PqAdcExpr(left: Expression, right: Expression, codebookSize: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(lutAny: Any, codesAny: Any): Any = {
    val lut = lutAny.asInstanceOf[ArrayData]
    val codes = codesAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (lut.numElements() != m * codebookSize) return null
    var acc = 0.0
    var j = 0
    while (j < m) { acc += lut.getDouble(j * codebookSize + codes.getInt(j)); j += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val j = ctx.freshName("j"); val mv = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      s"""
         |int $mv = $codes.numElements();
         |if ($lut.numElements() != $mv * $codebookSize) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $mv; $j++) {
         |    $acc += $lut.getDouble($j * $codebookSize + $codes.getInt($j));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc"
}

/** Per-list argmin-encode: `left` is the residual vector, `right` the
  * int list index selecting a slab of the STACKED codebook
  * (cbFlat(((li·m + j)·k + c)·dsub + t), halfFlat((li·m + j)·k + c)).
  * Same float-math conventions as [[PqEncodeExpr]] (ascending-t dots,
  * strict-< argmin with the +0.0 canon). Null on null/mis-sized input
  * or a list index outside the stacked range — an out-of-range slab
  * read would be silently wrong. */
case class PqEncodeListExpr(left: Expression, right: Expression,
                            cbFlat: Array[Double], halfFlat: Array[Double],
                            m: Int, codebookSize: Int,
                            dsub: Int) extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any, liAny: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val li = liAny.asInstanceOf[Int]
    if (v.numElements() != m * dsub) return null
    if (li < 0 || (li + 1) * m * codebookSize > halfFlat.length) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.PositiveInfinity
      var bestCode = 0
      var c = 0
      while (c < codebookSize) {
        var acc = 0.0
        val base = (((li * m + j) * codebookSize) + c) * dsub
        var t = 0
        while (t < dsub) { acc += v.getDouble(j * dsub + t) * cbFlat(base + t); t += 1 }
        val negs = -(acc - halfFlat((li * m + j) * codebookSize + c)) + 0.0
        if (negs < best) { best = negs; bestCode = c }
        c += 1
      }
      codes(j) = bestCode
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCbL", cbFlat, "double[]")
    val half = ctx.addReferenceObj("pqHalfL", halfFlat, "double[]")
    nullSafeCodeGen(ctx, ev, (v, li) => {
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val t = ctx.freshName("t"); val acc = ctx.freshName("acc")
      val best = ctx.freshName("best"); val bestCode = ctx.freshName("bestCode")
      val negs = ctx.freshName("negs"); val codes = ctx.freshName("codes")
      val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() != ${m * dsub} ||
         |    $li < 0 || ($li + 1) * ${m * codebookSize} > $half.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    int $bestCode = 0;
         |    for (int $c = 0; $c < $codebookSize; $c++) {
         |      double $acc = 0.0;
         |      int $base = ((($li * $m + $j) * $codebookSize) + $c) * $dsub;
         |      for (int $t = 0; $t < $dsub; $t++) {
         |        $acc += $v.getDouble($j * $dsub + $t) * $cb[$base + $t];
         |      }
         |      double $negs = -($acc - $half[($li * $m + $j) * $codebookSize + $c]) + 0.0;
         |      if ($negs < $best) { $best = $negs; $bestCode = $c; }
         |    }
         |    $codes[$j] = $bestCode;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeListExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_encode_list"
}

/** Per-list query LUT against `right`'s slab of the stacked codebook —
  * the residual-IVF-PQ query side, one LUT per (query, probed list). */
case class PqLutListExpr(left: Expression, right: Expression,
                         cbFlat: Array[Double], m: Int, codebookSize: Int,
                         dsub: Int) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any, liAny: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val li = liAny.asInstanceOf[Int]
    if (v.numElements() != m * dsub) return null
    if (li < 0 || ((li + 1) * m * codebookSize) * dsub > cbFlat.length) return null
    val lut = new Array[Double](m * codebookSize)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < codebookSize) {
        var acc = 0.0
        val base = (((li * m + j) * codebookSize) + c) * dsub
        var t = 0
        while (t < dsub) { acc += v.getDouble(j * dsub + t) * cbFlat(base + t); t += 1 }
        lut(j * codebookSize + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCbL", cbFlat, "double[]")
    nullSafeCodeGen(ctx, ev, (v, li) => {
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val t = ctx.freshName("t"); val acc = ctx.freshName("acc")
      val lut = ctx.freshName("lut"); val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() != ${m * dsub} ||
         |    $li < 0 || (($li + 1) * ${m * codebookSize}) * ${dsub} > $cb.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $lut = new double[${m * codebookSize}];
         |  for (int $j = 0; $j < $m; $j++) {
         |    for (int $c = 0; $c < $codebookSize; $c++) {
         |      double $acc = 0.0;
         |      int $base = ((($li * $m + $j) * $codebookSize) + $c) * $dsub;
         |      for (int $t = 0; $t < $dsub; $t++) {
         |        $acc += $v.getDouble($j * $dsub + $t) * $cb[$base + $t];
         |      }
         |      $lut[$j * $codebookSize + $c] = $acc;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($lut);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqLutListExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_lut_list"
}
