package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `cut_spans(text, cuts)` — the surviving text after removing every
  * 1-based, character-indexed `[span_start, span_end)` interval in
  * `cuts` from `text`. `cuts` is an `array<struct<span_start: long,
  * span_end: long>>` and must be SORTED ascending and DISJOINT — the
  * exact contract q119's trim plan pins for its merged intervals
  * (spans disjoint + ordered + in-doc, spec-pinned), so the one
  * producer in the engine satisfies it by construction.
  *
  * This is the codegen replacement for q121's interpreted `aggregate`
  * fold (the reference dedup discipline — Lee et al. ACL '22 trim
  * spans, not docs — applied to the corpus): the fold was the last
  * interpreted higher-order function adjacent to a documents scan
  * (CodegenFallback, SURVEY §2.10's house rule), while this expression
  * is ONE byte walk over the text inside whole-stage codegen — each
  * UTF-8 lead byte advances the character counter, continuation bytes
  * ride along, and a character's bytes are copied iff it lies outside
  * the current span. Characters are CODE POINTS, the same unit Spark's
  * `substr` used in the fold twin (equality differential-spec-pinned
  * on the live q119 relation and on constructed unicode/edge cases).
  *
  * Null semantics: null text or null cuts → null (the q121 call site
  * keeps its `when(cuts.isNull, text)` guard — span-free docs never
  * enter the expression); null ELEMENTS and null struct fields inside
  * `cuts` are skipped (the SQL registration makes them reachable even
  * though the engine's collect_list producer never emits them).
  * Out-of-range spans degrade exactly like the fold: positions past
  * the text end simply have nothing to cut. Unsorted or overlapping
  * spans throw IllegalArgumentException rather than silently dropping
  * the later-listed earlier span.
  */
case class CutSpans(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  // registered as a user-callable SQL function, so ill-typed calls must
  // die with a clean AnalysisException (the sibling-expression
  // contract), not a ClassCastException in eval or a codegen error
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(st: StructType, _))
          if st.fields.length == 2 &&
            st.fields.forall(_.dataType == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "cut_spans expects (string, array<struct<bigint, bigint>>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(text: Any, cuts: Any): Any =
    CutSpans.cutSpans(
      text.asInstanceOf[UTF8String], cuts.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) =>
      s"${ev.value} = graft.functions.CutSpans$$.MODULE$$.cutSpans($t, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutSpans =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cut_spans"
}

object CutSpans {

  /** Column-API lift (the Bridge pattern shared by every native
    * expression in this package). */
  def of(text: Column, cuts: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(CutSpans(
      org.apache.spark.sql.graftbridge.Bridge.expression(text),
      org.apache.spark.sql.graftbridge.Bridge.expression(cuts)))

  /** Shared by interpreted eval and generated code: one O(spans)
    * validation pass (null elements skipped — the SQL surface can
    * produce them even though the engine's collect_list producer never
    * does — and the sorted+disjoint contract ENFORCED, because a
    * violation would otherwise silently drop later-listed earlier
    * spans), then a single pass over the UTF-8 bytes tracking the
    * 1-based code-point index of the character at the cursor. Sorted
    * disjoint spans advance monotonically with it, so the whole call
    * is O(bytes + spans) with one output allocation. */
  def cutSpans(text: UTF8String, cuts: ArrayData): UTF8String = {
    val bytes = text.getBytes
    val nRaw = cuts.numElements()
    if (nRaw == 0) return UTF8String.fromBytes(bytes)
    // compact the spans to primitive arrays, skipping null elements /
    // null fields, and reject out-of-order or overlapping spans
    val starts = new Array[Long](nRaw)
    val ends = new Array[Long](nRaw)
    var nCuts = 0
    var r = 0
    while (r < nRaw) {
      if (!cuts.isNullAt(r)) {
        val c = cuts.getStruct(r, 2)
        if (!c.isNullAt(0) && !c.isNullAt(1)) {
          val st = c.getLong(0)
          val en = c.getLong(1)
          // reject inverted spans FIRST: an end < start would reset the
          // monotone ends chain, letting a later out-of-order span pass
          // this very validation and be silently dropped
          if (en < st)
            throw new IllegalArgumentException(
              s"cut_spans: span [$st, $en) is inverted (end < start)")
          if (nCuts > 0 && st < ends(nCuts - 1))
            throw new IllegalArgumentException(
              s"cut_spans: cuts must be sorted and disjoint, but span " +
                s"[$st, $en) starts before the previous span's end " +
                s"${ends(nCuts - 1)}")
          starts(nCuts) = st
          ends(nCuts) = en
          nCuts += 1
        }
      }
      r += 1
    }
    if (nCuts == 0) return UTF8String.fromBytes(bytes)
    val out = new Array[Byte](bytes.length)
    var o = 0       // bytes written
    var i = 0       // byte cursor (always at a char boundary)
    var ch = 1L     // 1-based code-point index of the char at `i`
    var s = 0       // current span
    var start = starts(0)
    var end = ends(0)
    while (i < bytes.length) {
      // full UTF-8 sequence of the char at i: lead byte + continuations
      var j = i + 1
      while (j < bytes.length && (bytes(j) & 0xC0) == 0x80) j += 1
      // spans are sorted+disjoint: once ch passes a span's end it never
      // matters again
      while (s < nCuts && ch >= end) {
        s += 1
        if (s < nCuts) { start = starts(s); end = ends(s) }
        else { start = Long.MaxValue; end = Long.MaxValue }
      }
      if (ch < start) { // outside every span: keep the char's bytes
        System.arraycopy(bytes, i, out, o, j - i)
        o += j - i
      }
      ch += 1
      i = j
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }
}
