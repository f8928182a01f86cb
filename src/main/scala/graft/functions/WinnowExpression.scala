package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing-fingerprint expression (Schleimer et al., SIGMOD'03)
  * — the codegen replacement for q26's nested char-shingle lambdas:
  *
  *   transform(sequence(1, len-7), i -> 60-bit md5 of substr(norm, i, 8))
  *   -> transform(sequence(1, m-3), j -> array_min(slice(hs, j, 4)))
  *   -> array_distinct
  *
  * Two stacked higher-order functions, both CodegenFallback — per
  * POSITION an interpreted substring + md5 dispatch, then per window an
  * interpreted slice + array_min — sitting on a full corpus text scan
  * (with SpanGrams and WordShingles native, this was the last
  * interpreted per-position lambda in the suite). One JVM loop instead:
  * hash every k-byte gram, take the min of each w-gram sliding window,
  * dedup in first-occurrence order.
  *
  * Input is the NORMALIZED text ([[Text.normalized]]: lowercase, alnum
  * runs separated by single spaces — pure ASCII by construction, so
  * byte positions equal the char positions the HOF reference and the
  * DuckDB oracle index with `substr`.
  *
  * Gram keys are the md5-prefix 60-bit construction shared with the
  * whole sketch family ([[SpanGrams]], DedupQueries.gramKey): first 15
  * hex nibbles of md5(gram) parsed base-16 — the DuckDB oracle
  * reproduces every bit. Edge parity (pinned by WinnowParitySpec
  * against the HOF reference): text shorter than the gram width yields
  * ONE gram (the whole text, empty included); fewer grams than the
  * window yields ONE window (the whole gram list). */
case class WinnowFingerprints(child: Expression, gram: Int, window: Int)
    extends UnaryExpression with ExpectsInputTypes {

  // no type annotation: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (gram < 1 || window < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints gram/window must be >= 1, got $gram/$window")
    else super.checkInputDataTypes()

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.fingerprints(
      input.asInstanceOf[UTF8String], gram, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprints$$.MODULE$$" +
        s".fingerprints($c, $gram, $window);")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)

  override def prettyName: String = "graft_winnow"
}

object WinnowFingerprints {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** 60-bit key of md5 over `bytes[off, off+len)` — the hex-prefix
    * construction conv(substring(md5_hex, 1, 15), 16, 10) parses:
    * digest bytes 0-6 in full plus the high nibble of byte 7. */
  private def key(md: MessageDigest, bytes: Array[Byte],
                  off: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var v = 0L
    var b = 0
    while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** One pass: gram keys at every start position (1 + max(len-gram, 0)
    * of them — the whole text as one gram when shorter), then the min
    * of each `window`-gram sliding window, deduped in first-occurrence
    * order. The window minima use a simple rescan-on-expiry rule: docs
    * are small relative to the corpus and window is a small constant,
    * so the O(m·w) bound is the per-document cost the HOF reference
    * already paid interpreted — this one runs fused. */
  def fingerprints(s: UTF8String, gram: Int, window: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    val md = md5.get()
    val m = math.max(len - gram + 1, 1)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = key(md, bytes, i, math.min(gram, len - i))
      i += 1
    }
    val wins = math.max(m - window + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < wins) {
      var mn = hs(j)
      var k = j + 1
      val end = math.min(j + window, m)
      while (k < end) { if (hs(k) < mn) mn = hs(k); k += 1 }
      seen.add(mn)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next().longValue(); p += 1 }
    new GenericArrayData(out)
  }
}
