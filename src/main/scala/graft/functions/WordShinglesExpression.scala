package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle builder — the codegen replacement for BOTH prior
  * formulations of "distinct n-token shingles of a document":
  *
  *  - the array HOF ([[Text.wordShingles]]' `transform(sequence(...),
  *    i => array_join(slice(toks, i, n)))`): correct, but higher-order
  *    functions are CodegenFallback — the lambda re-evaluates
  *    interpreted per element, capturing the whole token subtree, and
  *    breaks every whole-stage-codegen span it appears in (the last
  *    class-3 survivors in tools.CodegenAudit sat exactly here);
  *  - the window formulation ([[Text.shingleRows]]' posexplode →
  *    `lead(tok, k) over (partition by doc_id order by pos)` →
  *    distinct): codegen'd, but it EXCHANGES the whole token corpus on
  *    doc_id and sorts it, purely to realign tokens that were adjacent
  *    in the source array — at 100 TB that is the corpus on the wire
  *    for a per-document computation (the same round-7 lesson the span
  *    census already learned, SpanGramsExpression.scala).
  *
  * This expression is the [[Tokenize]]/[[SpanGrams]] treatment applied
  * to the `shingles` artifact build — one of exactly two corpus text
  * scans, the measured artifact-build cost center (SCALING.md): ONE JVM
  * loop over the token array, shingles assembled with
  * `UTF8String.concatWs` and deduped in first-occurrence order, codegen
  * via a static call. The shingle build becomes a pure map-side
  * project: tokenize → this → posexplode, NO exchange, NO sort.
  *
  * Edge parity (pinned by WordShinglesParitySpec against the kept
  * window-formulation reference, and corpus-wide by every shingle-
  * consumer oracle hash — q18/q19/q50/q52/q64/q66/q67/q80/q83):
  *  - a document with fewer than n tokens yields its whole token
  *    sequence as ONE shingle;
  *  - a document with NO tokens yields the empty-string shingle
  *    (the posexplode_outer row the window formulation kept);
  *  - within-document repeats collapse (set semantics per doc). */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // nullable-element arrays rejected, not skipped: every internal
      // producer is Tokenize (containsNull=false), and a null token has
      // no defined shingle rendering (the SpanGrams discipline)
      case ArrayType(StringType, true) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "word_shingles needs array<string> with non-null elements " +
            "(tokenizer output); got a nullable-element array")
      case ArrayType(StringType, false) if n < 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles n must be >= 1, got $n")
      case ArrayType(StringType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles needs array<string>, got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles$$.MODULE$$.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "graft_word_shingles"
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  /** One pass over the token array: the space-joined n-token window at
    * every full-window start position (the whole sequence as one
    * shingle when shorter than n; the empty string when empty), deduped
    * in first-occurrence order. */
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val width = math.min(n, len)
    val starts = len - width // inclusive last start index
    // first-occurrence-ordered dedup; docs are small relative to the
    // corpus, so a LinkedHashSet per invocation is the window
    // formulation's distinct at per-document scope
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](width)
    var i = 0
    while (i <= starts) {
      var k = 0
      while (k < width) { window(k) = tokens.getUTF8String(i + k); k += 1 }
      seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
