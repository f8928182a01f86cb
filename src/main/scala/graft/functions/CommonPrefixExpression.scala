package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `common_prefix_len(a, b)` — the number of leading CHARACTERS the two
  * strings share. The inner loop compares UTF-8 bytes (one memcmp-style
  * scan, no decoding), then converts the matched byte count to complete
  * code points, dropping a partially-matched multi-byte sequence at the
  * cut — so the result is always a valid character count, and on ASCII
  * input bytes == chars and the conversion is a no-op.
  *
  * This is the LCP primitive of the suffix-array family (q114): after the
  * bounded suffix sort, every adjacent cross-document pair is scored with
  * exactly one call, inside whole-stage codegen — the same reasoning as
  * Tokenize/SpanGrams: an interpreted HOF here would sit directly on the
  * corpus-positions scan, the largest row count in the engine.
  */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // no type annotation: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    CommonPrefixLen.prefixChars(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CommonPrefixLen$$.MODULE$$" +
        s".prefixChars($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixLen =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "common_prefix_len"
}

object CommonPrefixLen {

  /** Column-API lift (the Bridge pattern shared by every native
    * expression in this package). */
  def of(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(CommonPrefixLen(
      org.apache.spark.sql.graftbridge.Bridge.expression(a),
      org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  /** String twin for fused per-partition scans (q114's adjacent-pair
    * pass): longest common UTF-16 prefix, trimmed to a complete
    * surrogate pair, counted in code points — the same value as the
    * UTF8String byte scan below (both are "complete shared code
    * points"; equality spec-pinned in SuffixSpec).
    *
    * The trim fires exactly when the match cut splits a surrogate PAIR
    * on at least one side — including a cut at min-length (one string a
    * prefix of the other, the longer continuing with the low surrogate).
    * A high surrogate unpaired on BOTH sides is not trimmed: the UTF-8
    * encoder replaces each lone surrogate with `?`, so the byte twin
    * matches and counts it as a shared char, and the twins agree.
    * Contract note: the twins are guaranteed equal on well-formed UTF-16
    * (Spark `substr` never splits pairs, so every engine path is
    * well-formed); the one residual ill-formed corner — a lone surrogate
    * aligned against a literal `?` — collides under replacement
    * encoding and is out of contract on both twins. */
  def prefixChars(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    if (i > 0 && Character.isHighSurrogate(a.charAt(i - 1)) &&
        ((i < a.length && Character.isLowSurrogate(a.charAt(i))) ||
         (i < b.length && Character.isLowSurrogate(b.charAt(i))))) i -= 1
    a.codePointCount(0, i)
  }

  /** Shared by interpreted eval and generated code: matched-byte scan,
    * then complete-code-point count over the matched prefix. A UTF-8
    * lead byte is any byte with (b & 0xC0) != 0x80; a character is
    * counted iff its full sequence (lead + continuations) fits inside
    * the matched range — both strings agree byte-for-byte there, so the
    * sequence structure is identical on both sides. */
  def prefixChars(a: UTF8String, b: UTF8String): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    val n = math.min(ab.length, bb.length)
    var m = 0
    while (m < n && ab(m) == bb(m)) m += 1
    var i = 0
    var chars = 0
    while (i < m) {
      var j = i + 1
      while (j < ab.length && (ab(j) & 0xC0) == 0x80) j += 1
      if (j <= m) { chars += 1; i = j }
      else i = m // partial multi-byte sequence at the cut: not a char
    }
    chars
  }
}
