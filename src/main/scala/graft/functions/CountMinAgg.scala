package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Count-min sketch AGGREGATE (Cormode & Muthukrishnan, J.Alg. 2005):
  * `depth` hash rows × `width` counters; every occurrence increments one
  * counter per row; the estimate for a key is the MIN of its counters, so
  * estimates only ever OVER-count (collisions add, never subtract) —
  * `est(k) >= true(k)` is a structural guarantee, which is what makes the
  * sketch a sound heavy-hitter PREFILTER: no true heavy hitter can be
  * filtered out, and the exact verify pass removes every collision-borne
  * false positive (q66's bloom-then-verify discipline, applied to counts).
  *
  * Why it matters at 100 TB: exact heavy hitters via `groupBy(key)` ships
  * EVERY distinct key through the exchange — the long tail IS the shuffle.
  * The sketch is a few hundred KB per task regardless of key cardinality,
  * merges by vector addition, and the verify pass's exchange carries only
  * keys whose estimate clears the threshold (true heavies + a measured
  * handful of collisions).
  *
  * Hashing: the four rows consume the four 32-bit chunks of ONE md5 of
  * the key (q18's salted-chunk construction, one digest per update), so
  * the probe side is expressible with built-in codegen'd SQL functions:
  * `conv(substring(md5(key), 8j+1, 8), 16, 10) % width` — bit-identical
  * to [[CountMinAgg.rowIndex]], which the parity spec pins. Depth is
  * therefore fixed at 4; width is the accuracy knob (ε ≈ e/width over-
  * count per N, so width 4096 keeps expected inflation under 0.07% of N).
  *
  * The buffer is one flat Array[Long] of depth·width; serialize is the
  * raw longs. eval returns the flattened counters as `array<bigint>`
  * (row-major) — row sums all equal N, so the caller reads the corpus
  * total straight off the sketch with no extra pass.
  */
case class CountMinAgg(child: Expression, width: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(width > 0, s"width must be positive: $width")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count-min input must be string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](CountMinAgg.Depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val digest = CountMinAgg.md5.get()
      digest.reset()
      val d = digest.digest(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      var j = 0
      while (j < CountMinAgg.Depth) {
        buf(j * width + CountMinAgg.rowIndex(d, j, width)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMinAgg {
  /** Fixed by the one-md5-four-chunks construction. */
  val Depth: Int = 4

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Row j's counter index: md5 bytes 4j..4j+3 as an unsigned 32-bit int,
    * mod width — the JVM twin of the SQL probe
    * `conv(substring(md5(key), 8*j+1, 8), 16, 10) % width`. */
  def rowIndex(digest: Array[Byte], j: Int, width: Int): Int = {
    val o = j * 4
    val u = ((digest(o) & 0xffL) << 24) | ((digest(o + 1) & 0xffL) << 16) |
      ((digest(o + 2) & 0xffL) << 8) | (digest(o + 3) & 0xffL)
    (u % width).toInt
  }

  /** Column-API entry point. */
  def sketch(key: Column, width: Int): Column =
    Bridge.column(
      CountMinAgg(Bridge.expression(key), width).toAggregateExpression())
}
