package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mergeable one-pass QUANTILE SKETCH via a bottom-k hash-ordered sample
  * (Cohen & Kaplan's bottom-k sketches, PODC '07): keep the `k` rows with
  * the smallest values of a supplied hash column — a uniform
  * without-replacement sample of the group, because the hash order is a
  * random permutation of the rows — and estimate any quantile as the
  * corresponding order statistic of the sampled values. One pass, O(k)
  * state per group, merge = keep the k smallest of the union: the
  * monitoring-shape complement of the EXACT multi-pass quantiles
  * (q105/q109), whose bisection rounds are the wrong shape for
  * single-pass / streaming contexts.
  *
  * Why bottom-k and not KLL/t-digest (Karnin–Lang–Liberty, FOCS '16):
  * KLL's compaction decisions depend on ARRIVAL ORDER, so its output is
  * only deterministic for one fixed partitioning and merge tree — it can
  * never be replayed by a SQL oracle, and a repartition changes the
  * answer. The bottom-k sample is a pure function of the input MULTISET:
  * "the k smallest (hash, value) pairs" is commutative and associative
  * under merge, so the sketch is merge-order INVARIANT (spec-pinned
  * across partitionings) and exactly replayable in DuckDB with one
  * `row_number() OVER (ORDER BY hash)` — the q63 KMV discipline, which
  * is what keeps the engine's correctness gate a hash compare instead of
  * a rows-only waiver. The price is rank error O(sqrt(p(1-p)/k)) per
  * quantile versus KLL's O(1/k) — at k=256 about ±3% rank, the right
  * trade for a gate-checkable monitoring sketch (tighten with k).
  *
  * The hash is an input COLUMN, not baked into the aggregate: callers
  * pass the md5-prefix construction (`conv(substring(md5(key), 1, 15),
  * 16, 10)`, 60 bits) both engines compute bit-identically — the q18/q63
  * salted-chunk convention — keyed on a column that uniquely identifies
  * the ROW (sampling is row-wise; duplicate values stay duplicated, so
  * frequency weighting is preserved exactly).
  *
  * eval returns the sampled VALUES sorted ascending (`array<bigint>`):
  * the estimate arithmetic (rank = ceil(p·m/100), 1-based) stays visible
  * in the query and its oracle in the same integer form. Values are
  * LongType by contract — the house integer-exact discipline; a group
  * with at most k rows returns ALL its values, making the estimates
  * exact (and the sketch a drop-in for small groups).
  */
case class QuantileSketchAgg(left: Expression, right: Expression, k: Int,
                             emitPairs: Boolean = false,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketchAgg.Buf]
    with BinaryLike[Expression] {

  require(k > 0, s"sample size must be positive: $k")

  private def hashChild = left
  private def valueChild = right

  override def checkInputDataTypes(): TypeCheckResult =
    (hashChild.dataType, valueChild.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (h, v) => TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch expects (bigint hash, bigint value), got " +
          s"(${h.simpleString}, ${v.simpleString})")
    }

  // `emitPairs = true` returns the sketch's full (hash, value) CONTENT
  // instead of the value order statistics — the persistable/mergeable
  // form: re-aggregating emitted pairs with another QuantileSketchAgg
  // IS the sketch merge (bottom-k of a union of bottom-k's == bottom-k
  // of the union; q141's window topology rides this).
  override def dataType: DataType =
    if (emitPairs)
      ArrayType(StructType(Seq(
        StructField("h", LongType, nullable = false),
        StructField("v", LongType, nullable = false))),
        containsNull = false)
    else ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String =
    if (emitPairs) "quantile_sketch_pairs" else "quantile_sketch"

  override def createAggregationBuffer(): QuantileSketchAgg.Buf =
    new QuantileSketchAgg.Buf(k)

  override def update(buf: QuantileSketchAgg.Buf,
                      input: InternalRow): QuantileSketchAgg.Buf = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null)
      buf.offer(h.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(a: QuantileSketchAgg.Buf,
                     b: QuantileSketchAgg.Buf): QuantileSketchAgg.Buf = {
    b.foreachPair(a.offer)
    a
  }

  override def eval(buf: QuantileSketchAgg.Buf): Any =
    if (emitPairs)
      new GenericArrayData(buf.sortedPairs.map(p =>
        InternalRow(p(0), p(1)): Any))
    else new GenericArrayData(buf.sortedValues)

  override def serialize(buf: QuantileSketchAgg.Buf): Array[Byte] = {
    val pairs = buf.pairs
    val bb = ByteBuffer.allocate(4 + pairs.length * 8)
    bb.putInt(pairs.length / 2)
    bb.asLongBuffer().put(pairs)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QuantileSketchAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new QuantileSketchAgg.Buf(k)
    val lb = bb.asLongBuffer()
    var i = 0
    while (i < n) {
      buf.offer(lb.get(2 * i), lb.get(2 * i + 1))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileSketchAgg =
    copy(left = newLeft, right = newRight)
}

object QuantileSketchAgg {

  /** Bounded max-heap of (hash, value) pairs ordered lexicographically —
    * holds the k SMALLEST pairs seen (the heap head is the largest kept
    * pair, evicted when a smaller one arrives). The pair order, not the
    * hash alone, breaks hash collisions deterministically, so two rows
    * colliding on the 60-bit hash cannot make the kept multiset depend
    * on arrival order. */
  final class Buf(k: Int) {
    // max-heap via reversed lexicographic pair order
    private val heap = new java.util.PriorityQueue[Array[Long]](
      math.min(k, 1024),
      (a: Array[Long], b: Array[Long]) => {
        val c = java.lang.Long.compare(b(0), a(0))
        if (c != 0) c else java.lang.Long.compare(b(1), a(1))
      })

    def offer(h: Long, v: Long): Unit = {
      if (heap.size < k) heap.add(Array(h, v))
      else {
        val top = heap.peek()
        if (h < top(0) || (h == top(0) && v < top(1))) {
          heap.poll()
          heap.add(Array(h, v))
        }
      }
    }

    def foreachPair(f: (Long, Long) => Unit): Unit = {
      val it = heap.iterator()
      while (it.hasNext) { val p = it.next(); f(p(0), p(1)) }
    }

    /** Flat [h0, v0, h1, v1, ...] in arbitrary heap order (serialize
      * re-offers, so the wire order is irrelevant to the result). */
    def pairs: Array[Long] = {
      val out = new Array[Long](heap.size * 2)
      var i = 0
      val it = heap.iterator()
      while (it.hasNext) {
        val p = it.next()
        out(2 * i) = p(0); out(2 * i + 1) = p(1)
        i += 1
      }
      out
    }

    def sortedValues: Array[Long] = {
      val out = new Array[Long](heap.size)
      var i = 0
      val it = heap.iterator()
      while (it.hasNext) { out(i) = it.next()(1); i += 1 }
      java.util.Arrays.sort(out)
      out
    }

    /** The kept pairs in ascending (h, v) order — the deterministic
      * emit order for `emitPairs`. */
    def sortedPairs: Array[Array[Long]] = {
      val out = new Array[Array[Long]](heap.size)
      var i = 0
      val it = heap.iterator()
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      java.util.Arrays.sort(out, (a: Array[Long], b: Array[Long]) => {
        val c = java.lang.Long.compare(a(0), b(0))
        if (c != 0) c else java.lang.Long.compare(a(1), b(1))
      })
      out
    }
  }

  /** Column-API entry point: `quantile_sketch(hash, value, k)`. */
  def sketch(hash: Column, value: Column, k: Int): Column =
    Bridge.column(QuantileSketchAgg(
      Bridge.expression(hash), Bridge.expression(value), k)
      .toAggregateExpression())

  /** The sketch's CONTENT as `array<struct<h, v>>` in (h, v) order —
    * the persistable form a merge topology stores and re-aggregates
    * (explode + [[sketch]] over the pairs == merged sketch). */
  def sketchPairs(hash: Column, value: Column, k: Int): Column =
    Bridge.column(QuantileSketchAgg(
      Bridge.expression(hash), Bridge.expression(value), k,
      emitPairs = true).toAggregateExpression())
}
