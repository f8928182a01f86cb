package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native top-k AGGREGATE: keeps each group's k largest struct values in a
  * bounded min-heap and returns them as an array, largest first.
  *
  * Why this exists: the window formulation of per-group top-k
  * (`row_number() over (partition by g order by ...) <= k`, q10/q44)
  * shuffles EVERY row to its group's partition and sorts it, because a
  * window function cannot pre-aggregate. A bounded-heap aggregate gets
  * map-side partial aggregation for free — each map task sends at most k
  * rows per group over the wire — which at 100 TB is the difference
  * between shuffling the fact table and shuffling k·|groups| rows. This is
  * the same partial-combine idea as the reference's combiner
  * (reference main.c:62-81) applied to ranking instead of counting.
  *
  * Interface: the child is a STRUCT; rows are compared field-by-field
  * left to right (numeric/string fields, no nulls). Direction defaults
  * to descending per field; a numeric tie-breaker can simply be negated
  * (q62's shape), but a STRING tie-breaker cannot, so `asc` marks fields
  * to rank ascending (q44 ranks by tfidf desc, term asc). Output order
  * is best-first per the encoded directions, so element i is rank i+1.
  * Buffers serialize as length-prefixed UnsafeRow bytes for
  * partial/final exchange.
  */
case class TopKAgg(child: Expression, k: Int,
                   dedup: Boolean = false,
                   asc: Seq[Boolean] = Nil,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[UnsafeRow]]
    with UnaryLike[Expression] {

  require(k > 0, s"k must be positive: $k")

  /** Orderable field types [[ord]] supports. */
  private val orderableTypes: Set[DataType] =
    Set(LongType, IntegerType, DoubleType, FloatType, StringType)

  /** Fail at ANALYSIS time, not mid-job on an executor: the child must be
    * a struct of orderable fields. (Null FIELD values remain caller
    * contract — UnsafeRow reads them as zero/empty.) */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType =>
      if (asc.nonEmpty && asc.length != s.fields.length)
        return TypeCheckResult.TypeCheckFailure(
          s"asc has ${asc.length} flags for ${s.fields.length} struct fields")
      val bad = s.fields.filterNot(f => orderableTypes.contains(f.dataType))
      if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"topk struct fields must be long/int/double/float/string; got " +
          bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"topk input must be a struct, got ${other.simpleString}")
  }

  private lazy val childSchema = child.dataType.asInstanceOf[StructType]
  private lazy val fieldTypes = childSchema.fields.map(_.dataType)
  private lazy val proj = UnsafeProjection.create(fieldTypes)

  /** +1 (descending, default) or -1 (ascending) per struct field. */
  private lazy val fieldSign: Array[Int] =
    fieldTypes.indices.map(i =>
      if (asc.nonEmpty && asc(i)) -1 else 1).toArray

  /** Field-by-field comparison, no nulls (caller contract); "greater"
    * means "ranks earlier" per each field's direction. */
  private lazy val ord: Ordering[InternalRow] = new Ordering[InternalRow] {
    def compare(a: InternalRow, b: InternalRow): Int = {
      var i = 0
      while (i < fieldTypes.length) {
        val c = fieldTypes(i) match {
          case LongType    => java.lang.Long.compare(a.getLong(i), b.getLong(i))
          case IntegerType => Integer.compare(a.getInt(i), b.getInt(i))
          case DoubleType  => java.lang.Double.compare(a.getDouble(i), b.getDouble(i))
          case FloatType   => java.lang.Float.compare(a.getFloat(i), b.getFloat(i))
          case StringType  => a.getUTF8String(i).compareTo(b.getUTF8String(i))
          case dt => throw new UnsupportedOperationException(
            s"topk struct field type not orderable here: $dt")
        }
        if (c != 0) return fieldSign(i) * c
        i += 1
      }
      0
    }
  }

  override def dataType: DataType = ArrayType(childSchema, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk"

  // min-heap: head/dequeue yield the SMALLEST kept row, the eviction victim
  override def createAggregationBuffer(): mutable.PriorityQueue[UnsafeRow] =
    mutable.PriorityQueue.empty[UnsafeRow](ord.reverse.on[UnsafeRow](r => r))

  /** Admission test + insert, cheapest check first: once the heap is
    * full, most rows fail the O(1) threshold compare against the heap
    * minimum — a row below the minimum also cannot be a dedup-mode
    * duplicate (every kept row ≥ head > row), so the O(k) membership
    * scan runs only for rows that pass, and the defensive byte copy
    * (`owned = false` = the caller's buffer is reused per input row)
    * happens only on actual admission. Steady state: one comparison per
    * rejected row, zero allocation. */
  private def offer(heap: mutable.PriorityQueue[UnsafeRow],
                    row: UnsafeRow, owned: Boolean): Unit = {
    val full = heap.size >= k
    if (full && ord.compare(row, heap.head) <= 0) return
    if (dedup && heap.exists(ord.compare(_, row) == 0)) return
    if (full) heap.dequeue()
    heap.enqueue(if (owned) row else row.copy())
    ()
  }

  override def update(heap: mutable.PriorityQueue[UnsafeRow],
                      input: InternalRow): mutable.PriorityQueue[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) offer(heap, proj(v.asInstanceOf[InternalRow]), owned = false)
    heap
  }

  override def merge(a: mutable.PriorityQueue[UnsafeRow],
                     b: mutable.PriorityQueue[UnsafeRow]): mutable.PriorityQueue[UnsafeRow] = {
    b.foreach(offer(a, _, owned = true)) // deserialized rows are ours
    a
  }

  override def eval(heap: mutable.PriorityQueue[UnsafeRow]): Any =
    new GenericArrayData(
      heap.toArray.sorted(ord.reverse).asInstanceOf[Array[Any]])

  override def serialize(heap: mutable.PriorityQueue[UnsafeRow]): Array[Byte] = {
    val rows = heap.toArray
    val total = 4 + rows.map(4 + _.getSizeInBytes).sum
    val buf = ByteBuffer.allocate(total)
    buf.putInt(rows.length)
    rows.foreach { r =>
      buf.putInt(r.getSizeInBytes)
      buf.put(r.getBytes)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[UnsafeRow] = {
    val buf = ByteBuffer.wrap(bytes)
    val heap = createAggregationBuffer()
    val n = buf.getInt
    (0 until n).foreach { _ =>
      val len = buf.getInt
      val rowBytes = new Array[Byte](len)
      buf.get(rowBytes)
      val row = new UnsafeRow(fieldTypes.length)
      row.pointTo(rowBytes, len)
      heap.enqueue(row)
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
}

/** Column-API entry points for the native aggregates. */
object Aggregates {
  /** Top-k struct values per group, largest first (see [[TopKAgg]]). */
  def topK(structCol: Column, k: Int): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(structCol), k).toAggregateExpression())

  /** Top-k with explicit per-field direction (false = desc, true = asc) —
    * for tie-breakers that cannot be negated, e.g. ascending strings. */
  def topK(structCol: Column, k: Int, asc: Seq[Boolean]): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(structCol), k, asc = asc)
        .toAggregateExpression())

  /** Top-k DISTINCT struct values per group — the KMV sketch primitive:
    * duplicates never occupy a second sketch slot. */
  def topKDistinct(structCol: Column, k: Int): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(structCol), k, dedup = true)
        .toAggregateExpression())
}
