package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer expression — the codegen replacement for the
  * `split(lower(x)) → transform(substring) → filter(length > 0)` chain.
  *
  * That formulation is CORRECT but its ArrayTransform/ArrayFilter
  * higher-order functions are CodegenFallback in Spark: every Project
  * containing it evaluates interpreted and BREAKS the surrounding
  * whole-stage-codegen span (measured by tools.CodegenAudit — the
  * tokenize-bearing projections were the suite's largest interpreted
  * class). This expression does the whole pipeline in ONE byte scan and
  * participates in codegen via a static helper call, so tokenize-heavy
  * plans (the docFeatures/spanFeatures corpus scans, q1/q28's
  * wordcount shape) keep their spans fused.
  *
  * Semantics are EXACTLY [[Text]]'s reference-pinned tokenizer
  * (lowercase → maximal `[a-z0-9]` runs → 255-char cap):
  *
  *  - lowercasing calls the same `UTF8String.toLowerCase` Spark's
  *    `Lower` uses under the default collation, so locale oddities
  *    (Kelvin sign → 'k') agree;
  *  - after lowercasing, token chars are single-byte UTF-8 by
  *    construction and every byte of a multi-byte char is ≥ 0x80, so
  *    maximal `[a-z0-9]` BYTE runs equal the regex split's CHAR runs;
  *  - runs are non-empty by construction (the split's empty fragments
  *    simply never materialize) and the 255-char cap is 255 bytes on a
  *    pure-ASCII run.
  *
  * TokenizeParitySpec pins equivalence against the HOF formulation on
  * adversarial inputs (empty, all-separator, over-cap runs, Kelvin
  * sign, combining marks, astral chars); the DuckDB oracle hashes pin
  * it corpus-wide on every tokenizing query. */
case class Tokenize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // no type annotation: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Tokenize.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Tokenize$$.MODULE$$.tokenize($c);")

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)

  override def prettyName: String = "graft_tokenize"
}

object Tokenize {
  /** One-pass tokenize of a UTF8 string: lowercase, then collect maximal
    * `[a-z0-9]` byte runs, each capped at [[Text.MaxTokenLen]] bytes.
    * Token slices alias the lowercased buffer (`fromAddress`-style
    * zero-copy via `UTF8String.fromBytes(bytes, start, len)`). */
  def tokenize(s: UTF8String): ArrayData = {
    val b = s.toLowerCase.getBytes
    val n = b.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      if (isAlnum(b(i))) {
        val start = i
        while (i < n && isAlnum(b(i))) i += 1
        out += UTF8String.fromBytes(b, start,
          math.min(i - start, Text.MaxTokenLen))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  @inline private def isAlnum(c: Byte): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
}
