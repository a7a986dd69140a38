package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2-style byte-level representation (Radford et al. 2019; the
  * `bytes_to_unicode` construction in the public GPT-2 encoder): every
  * possible BYTE maps to one printable BMP character — visible ASCII,
  * Latin-1 print ranges map to themselves; the remaining 68 bytes
  * (controls, space, 0x7F–0xA0, 0xAD) map to U+0100.. in byte order —
  * so any byte string becomes a plain character string and back,
  * LOSSLESSLY. Running BPE over this representation makes encoding
  * TOTAL: the 256 single-byte symbols are always available as
  * fallback pieces, so no input can produce an unknown token — the
  * production-serving property word-level tokenizers lack.
  *
  * The map is a CONCATENATION HOMOMORPHISM (one char per byte), which
  * is what lets the whole existing BPE machinery run unchanged in rep
  * space: rep(a + b) = rep(a) + rep(b), so a merge list trained on
  * words transfers by repping each side ([[graft.operators.Bpe
  * .repMerges]]) and the rank loop ([[BpeEncode]]) needs no byte
  * variant. Rep characters are all ≥ U+0021 — never the U+001F merge
  * separator. */
object ByteLevel {

  /** byte (0–255) → representative char, the GPT-2 table. */
  val byteToChar: Array[Char] = {
    val keep = ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    val arr = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) arr(b) = b.toChar
      else { arr(b) = (0x100 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }

  /** representative char → byte, −1 for chars outside the table. */
  val charToByte: Array[Int] = {
    val a = Array.fill(0x200)(-1)
    var b = 0
    while (b < 256) { a(byteToChar(b)) = b; b += 1 }
    a
  }

  /** String → its byte-level representation (UTF-8 bytes, one rep char
    * each). Total: every byte has a rep char. */
  def toRep(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = byteToChar(bytes(i) & 0xff)
      i += 1
    }
    new String(out)
  }

  /** Inverse of [[toRep]]. Fails LOUDLY on a char outside the rep
    * alphabet — that is corrupt input (a rep string can only contain
    * table chars), never something to repair silently. */
  def fromRep(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val b = if (c < 0x200) charToByte(c) else -1
      if (b < 0) throw new IllegalArgumentException(
        s"fromRep: U+${c.toInt.toHexString} is not a byte-rep character " +
          "— the input is not a byte-level representation")
      bytes(i) = b.toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Per-row kernels (also the generated code's callees). */
  def rep(s: UTF8String): UTF8String = UTF8String.fromString(toRep(s.toString))

  def unrep(tokens: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < tokens.numElements()) {
      sb.append(tokens.getUTF8String(i).toString)
      i += 1
    }
    UTF8String.fromString(fromRep(sb.toString))
  }
}

/** STRING → its byte-level rep STRING (codegen'd, stateless). */
case class ByteRep(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ByteLevel.rep(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteLevel.rep($c);")

  override protected def withNewChildInternal(newChild: Expression): ByteRep =
    copy(child = newChild)

  override def prettyName: String = "byte_rep"
}

object ByteRep {
  def apply(c: Column): Column = ColumnBridge.column(
    ByteRep(Cast(ColumnBridge.expression(c), StringType)))
}

/** ARRAY<STRING> of rep-space tokens → the decoded STRING (concat in
  * rep space, then bytes, then UTF-8) — the decode side of byte-level
  * BPE serving. decode ∘ encode is the identity on ANY input (oracled
  * as q_t43). */
case class ByteRepDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ByteLevel.unrep(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteLevel.unrep($c);")

  override protected def withNewChildInternal(
      newChild: Expression): ByteRepDecode = copy(child = newChild)

  override def prettyName: String = "byte_rep_decode"
}

object ByteRepDecode {
  def apply(c: Column): Column =
    ColumnBridge.column(ByteRepDecode(ColumnBridge.expression(c)))
}
