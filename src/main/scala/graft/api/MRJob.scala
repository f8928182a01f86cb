package graft.api

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference engine's public API (reference mapreduce.h:67-161),
  * re-expressed as an idiomatic Spark surface. The contract preserved:
  *
  *  - `map(chunk, filename)` — the Mapper + MR_CurrentFile pair
  *    (mapreduce.h:67-91, mapreduce.c:56-58): a per-chunk UDTF emitting
  *    (key, value) pairs; emission is the returned iterator, not a
  *    side-channel like MR_Emit.
  *  - `combine(key, values)` — the optional in-place partial aggregate
  *    (mapreduce.h:123-135), applied map-side at flush boundaries exactly
  *    like `flush_buffer_to_partitions` (reference buffer.c:88-176),
  *    including the 50k-value flush threshold semantics.
  *  - `reduce(key, valueIterator)` — the final aggregate with the
  *    value-iterator protocol (mapreduce.h:93-121, reduce.c:25-47). Keys
  *    arrive in ascending order within a partition, the reference's
  *    documented guarantee (mapreduce.h:105, sorting.c:29-33).
  *  - `partitionExpr` — the pluggable deterministic partitioner
  *    (mapreduce.h:139-161), as a CO-LOCATION contract: rows with equal
  *    expression values land in the same partition (routed by the hash of
  *    the expression, Spark's idiom), not at the literal index the
  *    expression evaluates to. The reference's djb2 index placement is
  *    deliberately not reproduced: placement affects only which output
  *    file a key lands in, never results (SURVEY.md §2.4).
  *
  * Execution shape: flatMap → optional map-side combine (mapPartitions
  * with a bounded hash buffer) → repartition(n, key-expr) →
  * sortWithinPartitions → mapPartitions streaming the grouped-key reduce.
  * On a cluster every stage is shared-nothing; the only shuffle is the
  * repartition, matching the reference's single map→reduce exchange.
  */
final case class MRJob(
    map: (String, String) => IterableOnce[(String, String)],
    reduce: (String, Iterator[String]) => IterableOnce[String],
    combine: Option[(String, Seq[String]) => Seq[String]] = None,
    numPartitions: Int = 32,
    partitionExpr: Option[Column] = None,
    /** Map-side buffer flush threshold, in buffered values — the
      * reference's FLUSH_THRESHOLD (mapreduce_internal.h:85). */
    flushThreshold: Int = 50000) {
  // config validation, the MR_Run contract (reference job.c:53-92)
  require(numPartitions > 0, s"numPartitions must be positive: $numPartitions")
  require(flushThreshold > 0, s"flushThreshold must be positive: $flushThreshold")
}

object MRJob {

  /** Read input files as (filename, chunk) pairs — the analog of the
    * reader/chunk pipeline (reference reader_queue.c). Line-based splits
    * make the reference's token-boundary realignment (reader_queue.c:
    * 207-306) unnecessary: tokens never span lines (SURVEY.md §2.1 S3). */
  def textInput(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.text(paths: _*)
      .select(input_file_name().as("filename"), col("value").as("chunk"))

  /** Run the job over any (filename, chunk) input and return the reduced
    * (key, out) pairs. Deterministic given deterministic callbacks. */
  def run(spark: SparkSession, job: MRJob, input: DataFrame): Dataset[(String, String)] = {
    import spark.implicits._
    // bind callbacks locally: task closures must not capture `job` itself,
    // whose partitionExpr Column is not serializable
    val mapFn = job.map
    val reduceFn = job.reduce
    val flushThreshold = job.flushThreshold
    val pairs = input
      .select(col("filename").cast("string"), col("chunk").cast("string"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (file, chunk) => mapFn(chunk, file) })

    // Map-side combine with a bounded buffer — the Spark re-expression of
    // the reference's local_buffer_t + flush protocol (buffer.c:187-235,
    // :88-176): accumulate up to flushThreshold values in a local hash
    // buffer, run the combiner per key at each flush. Without a combiner
    // this stage disappears (matching MR_DISABLE_COMBINER=1, job.c:209-217).
    val combined = job.combine match {
      case None => pairs
      case Some(cmb) =>
        pairs.mapPartitions(_.grouped(flushThreshold).flatMap { batch =>
          val buf = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
          batch.foreach { case (k, v) =>
            buf.getOrElseUpdate(k, mutable.ArrayBuffer.empty) += v
          }
          buf.iterator.flatMap { case (k, vs) => cmb(k, vs.toSeq).map(k -> _) }
        })
    }

    val keyed = combined.toDF("key", "value")
    val parted = job.partitionExpr match {
      case Some(e) => keyed.repartition(job.numPartitions, e)
      case None    => keyed.repartition(job.numPartitions, col("key"))
    }
    parted
      .sortWithinPartitions("key")
      .as[(String, String)]
      .mapPartitions { it =>
        // Grouped-key streaming: the get_next_value iterator protocol
        // (reference reduce.c:25-47) — values of one key stream through
        // the user reduce without materializing other keys.
        // named `in`, not `buffered`: inside `new Iterator` the inherited
        // Iterator.buffered method would shadow an outer val of that name
        val in = it.buffered
        new Iterator[Iterator[(String, String)]] {
          def hasNext: Boolean = in.hasNext
          def next(): Iterator[(String, String)] = {
            val key = in.head._1
            val values = new Iterator[String] {
              def hasNext: Boolean = in.hasNext && in.head._1 == key
              def next(): String = in.next()._2
            }
            // materialize this key's outputs before advancing past it,
            // then drain any values the reducer didn't consume
            val out = reduceFn(key, values).iterator.toVector
            while (values.hasNext) values.next()
            out.iterator.map(key -> _)
          }
        }.flatten
      }
  }

  /** Run and write one text file per partition, `key\tvalue` lines — the
    * analog of the reference's part-%05d.txt sink (main.c:92-98). */
  def runToText(spark: SparkSession, job: MRJob, input: DataFrame,
                outputDir: String): Unit = {
    import spark.implicits._
    run(spark, job, input)
      .map { case (k, v) => s"$k\t$v" }
      .write.mode(SaveMode.Overwrite).text(outputDir)
  }
}
