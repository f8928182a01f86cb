package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded per-partition in batches — the plan shape a real
  * image/audio pipeline needs (scan → narrow mapPartitions → columnar
  * metadata), with the actual codec STUBBED deterministically because no
  * media libraries ship in this environment.
  *
  * The Spark-side contract is real and tested:
  *  - payloads travel as `BinaryType` columns (no driver collect);
  *  - decode runs inside `mapPartitions` over a typed Dataset, one
  *    partition-sized batch iterator per task — exactly where a JNI/FFmpeg
  *    or JPEG decoder would sit, and where a Python pipeline would use
  *    `mapInPandas`;
  *  - extracted metadata comes back as ordinary columns for downstream
  *    relational ops.
  *
  * The stub "decode" maps bytes → (width, height, channels, checksum) by
  * pure arithmetic on the payload, so the DuckDB oracle can verify the
  * whole pipeline end-to-end.
  */
object MultimodalPipeline {

  /** Input record: payload + format tag (as a real media table would be). */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], fmt: String)

  /** Typed metadata the stub decoder extracts. */
  final case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int,
                             height: Int, channels: Int, checksum: String)

  /** Deterministic fake decoder — replace the body with a real codec; the
    * signature (one record in, typed metadata out, called from a batch
    * iterator) is the production shape. */
  def decodeStub(r: MediaRecord): MediaMeta = {
    val md = MessageDigest.getInstance("MD5")
    val checksum = md.digest(r.payload).map("%02x".format(_)).mkString
    val n = r.payload.length
    MediaMeta(r.doc_id, n, n % 320 + 1, (n * 7) % 240 + 1, 3, checksum)
  }

  /** Documents rendered as a media table: UTF-8 bytes standing in for an
    * encoded image/audio blob. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("bin/fake").as("fmt"))

  /** Q27: scan binary payloads, batch-decode per partition, return typed
    * metadata. The mapPartitions boundary is the only non-codegen stage —
    * by design, since that's where the native decoder lives. */
  def q27MultimodalMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir).as[MediaRecord]
      .mapPartitions(batch => batch.map(decodeStub))
      .toDF()
      .orderBy("doc_id")
  }
}
