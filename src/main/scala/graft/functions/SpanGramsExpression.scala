package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native span-gram census expression — the codegen replacement for the
  * `transform(sequence(0, n−1), i => struct(element_at(t, i+1),
  * gramKey(concat_ws(" ", element_at×w))))` lambda that generates the
  * span-feature rows (the distributed suffix-array stand-in behind the
  * q88/q89/q92/q44/q20/q48 family).
  *
  * That lambda is the single most expensive per-row computation in the
  * engine's corpus scans — w array lookups, a w-token concat and an md5
  * per POSITION — and as a higher-order function it evaluates
  * interpreted (CodegenFallback) with per-element expression-tree
  * dispatch. At 100 TB the span census is THE artifact-build cost
  * center, so it gets the [[Tokenize]] treatment: one JVM loop over the
  * token array, the gram digested incrementally (no gram string is even
  * assembled — `MessageDigest.update` per token + separator), codegen
  * via a static call.
  *
  * Output element struct: `w` = the position's token (never null),
  * `g` = the md5-derived 60-bit gram key for full-width start
  * positions, null for the last width−1 positions — exactly
  * [[graft.operators.DedupQueries.gramKey]]'s construction: the first
  * 15 hex nibbles of md5 parsed base-16, i.e. the digest's first
  * 60 bits ((bytes[0..6] << 4) | (bytes[7] >>> 4)), which both the HOF
  * reference and the DuckDB oracle reproduce bit-for-bit
  * (SpanGramsParitySpec pins the first; the q88/q89/q92/q44/q20/q48
  * oracle hashes pin the second corpus-wide). */
case class SpanGrams(child: Expression, width: Int)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // containsNull inputs are REJECTED, not skipped: the output
      // declares `w` non-nullable (every internal producer is Tokenize,
      // containsNull=false), and a null element would otherwise NPE in
      // the loop / violate the declared schema for SQL-surface callers
      case ArrayType(StringType, true) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "span_grams needs array<string> with non-null elements " +
            "(tokenizer output); got a nullable-element array")
      case ArrayType(StringType, false) if width < 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"span_grams width must be >= 1, got $width")
      case ArrayType(StringType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"span_grams needs array<string>, got $other")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w", StringType, nullable = false),
      StructField("g", LongType, nullable = true))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SpanGrams.spanGrams(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SpanGrams$$.MODULE$$.spanGrams($c, $width);")

  override protected def withNewChildInternal(newChild: Expression): SpanGrams =
    copy(child = newChild)

  override def prettyName: String = "graft_span_grams"
}

object SpanGrams {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val Space = Array[Byte](' ')

  /** One pass over the token array: per position its token, plus (for
    * start positions with a full window) the 60-bit key of the
    * space-joined width-token gram, digested incrementally. */
  def spanGrams(tokens: ArrayData, width: Int): ArrayData = {
    val n = tokens.numElements()
    val md = md5.get()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i)
      val g: Any = if (i <= n - width) {
        md.reset()
        var k = 0
        while (k < width) {
          if (k > 0) md.update(Space)
          md.update(tokens.getUTF8String(i + k).getBytes)
          k += 1
        }
        val d = md.digest()
        // first 15 hex nibbles of the digest as a long: bytes 0-6 in
        // full plus the high nibble of byte 7 — the value
        // conv(substring(hex, 1, 15), 16, 10) parses
        var v = 0L
        var b = 0
        while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        java.lang.Long.valueOf((v << 4) | ((d(7) & 0xffL) >>> 4))
      } else null
      out(i) = new GenericInternalRow(Array[Any](w, g)): InternalRow
      i += 1
    }
    new GenericArrayData(out)
  }
}
