package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
    // n·7 in LONG: an Int multiply wraps for payloads >= ~307 MB (a
    // realistic media blob), which would yield height <= 0 and a
    // divide-by-zero downstream in the resize math. Matches the DuckDB
    // oracle, whose octet_length arithmetic is 64-bit throughout.
    MediaMeta(r.doc_id, n, n % 320 + 1, (n.toLong * 7 % 240 + 1).toInt,
      3, checksum)
  }

  /** Documents rendered as a media table: UTF-8 bytes standing in for an
    * encoded image/audio blob. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("bin/fake").as("fmt"))

  /** The WIDE media fixture: payloads whose bytes regularly exceed 0x7F,
    * so the byte-slicing operators (q37 frames, q61 audio windows) are
    * exercised on genuine binary data, not on an ASCII corpus where
    * chars == bytes hides offset bugs. Each text char expands to TWO
    * bytes — the char itself and `(7·c + 13) mod 256` (a full-range
    * mixed byte) — a deterministic formula the DuckDB oracle replays
    * per byte position, so frame offsets/lengths/digests verify against
    * real multi-range bytes. PRECONDITION that remains: the SOURCE text
    * must be single-code-unit chars with codepoint ≤ 127 (this corpus
    * is), because Scala reads UTF-16 units (`charAt(i).toInt`, byte =
    * mod 256) while DuckDB's `ascii(substr(...))` returns the full
    * Unicode codepoint and `length()` counts codepoints — a char >
    * 0xFF (or any astral char, which also changes the byte count)
    * makes the two formulas diverge and the hash gate fire. What the
    * fixture removed is the chars==bytes assumption in the PAYLOAD
    * (slicing runs on real >0x7F bytes); the text→byte derivation
    * itself is still ASCII-anchored by construction. */
  def mediaTableWide(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val bytes = new Array[Byte](text.length * 2)
        var i = 0
        while (i < text.length) {
          val c = text.charAt(i).toInt
          bytes(2 * i) = c.toByte
          bytes(2 * i + 1) = ((c * 7 + 13) % 256).toByte
          i += 1
        }
        (id, bytes, "bin/wide")
      }
      .toDF("doc_id", "payload", "fmt")
  }

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

  /** One sampled frame: parent doc, frame index, byte offset, and the
    * frame's own payload slice (what a video pipeline hands to the
    * per-frame model). */
  final case class Frame(doc_id: Long, frame_idx: Int, byte_offset: Int,
                         frame_bytes: Array[Byte])

  /** Frames every `stride` bytes, up to `maxFrames` — the frame-sampling
    * plumbing of a video pipeline (seek table stands in for real codec
    * keyframe offsets). Emission is a per-partition iterator: one input
    * record fans out to ≤ maxFrames rows without materializing the whole
    * partition. Reads the [[mediaTableWide]] fixture: frame slicing is
    * byte arithmetic, and it must be proven on bytes > 0x7F. */
  def sampleFrames(spark: SparkSession, sfDir: String,
                   stride: Int = 64, maxFrames: Int = 8): Dataset[Frame] = {
    import spark.implicits._
    mediaTableWide(spark, sfDir).as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        val n = math.min(maxFrames, math.max(1, r.payload.length / stride))
        (0 until n).iterator.map { i =>
          val off = i * stride
          val end = math.min(off + stride, r.payload.length)
          Frame(r.doc_id, i, off, r.payload.slice(off, end))
        }
      })
  }

  /** Q37: frame sampling + per-frame feature extraction (stub: frame
    * length and a digest of the slice). The real pipeline swaps the
    * digest for a JNI decoder + model call; plan shape (scan → narrow
    * fan-out → columnar features → relational ops downstream) is
    * identical.
    *
    * Over the [[mediaTableWide]] fixture, so offsets and lengths are
    * byte semantics on real >0x7F bytes (the payload-side chars==bytes
    * assumption is gone; the fixture's ASCII-source precondition is
    * documented on [[mediaTableWide]]).
    * The fingerprint is md5 of the slice's lowercase-hex rendering (a
    * bijection of the bytes): DuckDB 1.0 has no BLOB digests, and
    * hashing the hex lets the oracle verify every sliced byte while the
    * Spark side still slices genuine byte arrays. */
  def q37FrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    sampleFrames(spark, sfDir)
      .map { f =>
        val md = MessageDigest.getInstance("MD5")
        val hex = f.frame_bytes.map("%02x".format(_)).mkString
        (f.doc_id, f.frame_idx, f.byte_offset, f.frame_bytes.length,
          md.digest(hex.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      }
      .toDF("doc_id", "frame_idx", "byte_offset", "frame_len", "frame_md5")
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize stub: scale the decoded dimensions to fit a bounding box,
    * preserving aspect ratio (integer arithmetic only, so the DuckDB
    * oracle reproduces it exactly). A real pipeline would transform the
    * pixel buffer here; the metadata contract downstream is identical. */
  def q41Resize(spark: SparkSession, sfDir: String,
                maxW: Int = 64, maxH: Int = 64): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir).as[MediaRecord]
      .mapPartitions(_.map { r =>
        val m = decodeStub(r)
        // scale = min(maxW/w, maxH/h) in 1/1000ths, capped at 1000 (never
        // upscale); integer math keeps both engines bit-identical
        val scaleMilli = math.min(1000L,
          math.min(maxW * 1000L / m.width, maxH * 1000L / m.height))
        val outW = math.max(1L, m.width * scaleMilli / 1000L)
        val outH = math.max(1L, m.height * scaleMilli / 1000L)
        (m.doc_id, m.width, m.height, scaleMilli, outW, outH)
      })
      .toDF("doc_id", "width", "height", "scale_milli", "out_width", "out_height")
      .orderBy("doc_id")
  }

  /** One audio analysis window: parent doc, window index, sample offset,
    * window payload. */
  final case class AudioWindow(doc_id: Long, win_idx: Int,
                               sample_offset: Int, samples: Array[Byte])

  /** Q61: audio-style OVERLAPPING window framing + per-window features —
    * the audio twin of q37's video frame sampling. What makes audio
    * different from video frames is hop < window (here 50% overlap:
    * window 256, hop 128), the frame/hop layout every STFT/fbank
    * front-end uses; payload bytes stand in for 8-bit PCM samples. The
    * per-window feature is signal energy Σ(sample−128)² — an exact
    * integer, so the DuckDB oracle reproduces it bit-for-bit (a real
    * pipeline swaps in an FFT/filterbank at the same mapPartitions seam).
    * Window count capped at 16 per doc, mirroring q37's maxFrames.
    * Reads the [[mediaTableWide]] fixture: the energy sum runs over
    * full-range bytes (the mixed byte puts real mass on both sides of
    * the 128 midpoint), and the oracle replays the per-position byte
    * formula instead of assuming chars == bytes (subject to the
    * ASCII-source precondition documented on [[mediaTableWide]]). */
  def q61AudioWindows(spark: SparkSession, sfDir: String,
                      window: Int = 256, hop: Int = 128,
                      maxWindows: Int = 16): DataFrame = {
    import spark.implicits._
    mediaTableWide(spark, sfDir).as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        val n = r.payload.length
        val nWin = math.min(maxWindows, math.max(1, n / hop))
        (0 until nWin).iterator.map { i =>
          val off = i * hop
          val end = math.min(off + window, n)
          AudioWindow(r.doc_id, i, off, r.payload.slice(off, end))
        }
      })
      .map { w =>
        val energy = w.samples.foldLeft(0L) { (acc, b) =>
          val s = (b & 0xff) - 128L; acc + s * s
        }
        (w.doc_id, w.win_idx, w.sample_offset, w.samples.length, energy)
      }
      .toDF("doc_id", "win_idx", "sample_offset", "n_samples", "energy")
      .orderBy("doc_id", "win_idx")
  }

  /** Embedding-extraction stub: payload → deterministic feature vector
    * (byte histogram over 16 buckets, L2-normalized) as `array<float>` —
    * the column type the similarity operators (q17/q21/q22) consume. The
    * production version replaces the histogram with a model forward pass;
    * everything downstream (schema, joins, ANN) is unchanged.
    *
    * Emits both the raw vector (for in-JVM consumers and the unit-norm
    * spec) and an integer projection of it: `norm_milli = floor(norm*1e3)`
    * and `embedding_csv` = comma-joined `floor(f32_component * 1e6)`.
    * Every step of that projection (integer counts, exact double sums
    * < 2^53, IEEE sqrt/divide, round-to-nearest float32 cast, floor) is
    * bit-reproducible in any IEEE-754 engine, so the DuckDB oracle can
    * hash-verify it — and the projection is plain longs/strings, which
    * keeps the driver's pandas sort path happy (raw float arrays are not
    * sortable there). */
  private def embedAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir).as[MediaRecord]
      .map { r =>
        val hist = new Array[Float](16)
        r.payload.foreach(b => hist((b & 0xff) / 16) += 1f)
        val norm = math.sqrt(hist.map(x => x.toDouble * x).sum).max(1e-9)
        val emb = hist.map(x => (x / norm).toFloat)
        (r.doc_id, emb, emb.length,
          math.floor(norm * 1000d).toLong,
          emb.map(f => math.floor(f.toDouble * 1e6).toLong).mkString(","))
      }
      .toDF("doc_id", "embedding", "dim", "norm_milli", "embedding_csv")
  }

  /** The `array<float>` embedding column for JVM consumers (specs, ANN). */
  def embedVectors(spark: SparkSession, sfDir: String): DataFrame =
    embedAll(spark, sfDir).select("doc_id", "embedding")

  /** Q38: the driver-facing, oracle-checkable projection (see embedAll). */
  def q38EmbedStub(spark: SparkSession, sfDir: String): DataFrame =
    embedAll(spark, sfDir)
      .select("doc_id", "dim", "norm_milli", "embedding_csv")
      .orderBy("doc_id")
}
