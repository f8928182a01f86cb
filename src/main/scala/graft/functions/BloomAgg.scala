package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter AGGREGATE over a long column, wrapping Spark's public
  * mergeable sketch (`org.apache.spark.util.sketch.BloomFilter` — the
  * same structure `DataFrameStatFunctions.bloomFilter` builds, exposed
  * here as a GROUPED aggregate so one pass can emit one filter PER
  * GROUP, e.g. per output file of a table commit).
  *
  * Why it matters at 100 TB: a point lookup (`k = v`) on a column the
  * table is NOT clustered by can't use min/max bounds — every file's
  * [lo, hi] spans the whole domain, so bounds pruning keeps everything.
  * A per-file Bloom filter answers "is v definitely absent from this
  * file?" from kilobytes of metadata: false positives cost one wasted
  * file read, false negatives never happen, so skipping is always
  * sound. This is the role of Parquet's bloom_filter_enabled pages and
  * Delta's bloom index files; graft stores them as per-commit sidecars
  * next to the manifest's per-file stats (ManifestTable format v5).
  *
  * The buffer is the sketch itself; update is `putLong`, merge is the
  * sketch's own union (`mergeInPlace` — requires identical sizing,
  * which holds because every instance of this aggregate creates its
  * buffers with the same (expectedItems, fpp)). eval returns the
  * serialized filter as `binary`.
  *
  * Input must already be LongType — callers cast (`col.cast("long")`
  * for integral columns, `unix_micros` for timestamps) so the stored
  * probe contract is explicit: `mightContainLong` answers for exactly
  * the long the writer put in.
  */
case class BloomAgg(child: Expression, expectedItems: Long, fpp: Double,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter]
    with UnaryLike[Expression] {

  require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
  require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom input must be long (cast first), got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
    a.mergeInPlace(b)

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

object BloomAgg {
  /** Column-API entry point; `key` must already be LongType. */
  def sketch(key: Column, expectedItems: Long, fpp: Double): Column =
    Bridge.column(
      BloomAgg(Bridge.expression(key), expectedItems, fpp)
        .toAggregateExpression())
}
