package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Table registry over the driver-provided parquet test data (TESTDATA.md).
  *
  * At 100 TB these would be bucketed/partitioned catalog tables; reads stay
  * declarative (`spark.read.parquet`) so Catalyst gets predicate pushdown,
  * column pruning and partition pruning for free on every query built on top.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** A scale dir rendered as a safe identifier fragment for artifact
    * names (signature tables, staged source dirs). Sanitization alone can
    * alias two dirs that differ only in punctuation (sf0.1 vs sf0_1), so
    * a hash of the RAW path is appended — distinct dirs can never share
    * an artifact — and a CONTENT FINGERPRINT of the dir listing (every
    * file's path + length + mtime, hashed) is folded in, so a dir whose
    * files are rewritten mid-session gets a NEW key and every artifact /
    * staged render keyed on it rebuilds instead of silently serving
    * stale rows (ArtifactsSpec pins it; per-file metadata, not
    * aggregates, so even a same-size same-mtime file SWAP re-keys as
    * long as any path differs — parquet part names are write-unique).
    * The fingerprint is one recursive listing — metadata only, no data
    * read — per artifact-name derivation, i.e. per plan build.
    * Microseconds on a local corpus; on an object store holding
    * millions of files, set `spark.graft.dirFingerprint=false` and use
    * immutable versioned snapshot paths instead (the production layout:
    * a new crawl lands under a NEW path, so the path hash alone is the
    * content key and the listing buys nothing). A listing failure (dir
    * not yet present) degrades to the path-only key rather than failing
    * the read that will surface the real error. */
  def dirKey(spark: SparkSession, sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(sfDir)) +
      dirFingerprint(Some(spark), sfDir).fold("")("_" + _)

  /** Session-less convenience overload (tests, name derivation outside a
    * query builder). Resolves the session as active-then-default: the
    * thread-local active session is UNSET on streaming micro-batch and
    * pool threads, and falling straight to a bare `new Configuration()`
    * there would (a) lose object-store credentials and (b) let the same
    * sfDir produce DIFFERENT keys on different threads, silently
    * splitting every artifact/model cache keyed on it. Main-code call
    * sites all pass their session explicitly. */
  def dirKey(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(sfDir)) +
      dirFingerprint(SparkSession.getActiveSession
        .orElse(SparkSession.getDefaultSession), sfDir).fold("")("_" + _)

  /** Hash of the dir's recursive (path, length, mtime) listing; None if
    * the dir can't be listed or fingerprinting is disabled
    * (`spark.graft.dirFingerprint=false` for immutable snapshot dirs). */
  private def dirFingerprint(session: Option[SparkSession],
                             sfDir: String): Option[String] = {
    val enabled = session.forall(
      _.conf.get("spark.graft.dirFingerprint", "true") != "false")
    if (!enabled) None
    else scala.util.Try {
      val p = new org.apache.hadoop.fs.Path(sfDir)
      // the SESSION's Hadoop conf, not a bare new Configuration():
      // object-store credentials/endpoints arrive via spark.hadoop.*,
      // and without them the listing throws and the fingerprint would
      // silently degrade to the path-only key on exactly the fs that
      // needs it
      val conf = session.map(_.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      val fs = p.getFileSystem(conf)
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(p, /* recursive = */ true)
      while (it.hasNext) {
        val st = it.next()
        entries +=
          s"${st.getPath.toUri.getPath}:${st.getLen}:${st.getModificationTime}"
      }
      Integer.toHexString(scala.util.hashing.MurmurHash3
        .orderedHash(entries.sortInPlace()))
    }.toOption
  }

  /** Register every table as a temp view so `spark.sql` mirrors the oracle. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped in two parquet encodings across fixture
    * generations: TIMESTAMP(NANOS), which Spark 4 only reads as a long
    * (spark.sql.legacy.parquet.nanosAsLong — set by GraftSession), and
    * TIMESTAMP(MICROS) without UTC adjustment, which reads as
    * TIMESTAMP_NTZ unless the session pins LTZ inference. Normalize both
    * to a microsecond TimestampType column here so every operator
    * downstream sees a plain session-TZ timestamp. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        // integer FLOOR division, not `/` (nanos-since-epoch overflows a
        // double's 53-bit mantissa) and not bare DIV (which truncates
        // toward zero, so a pre-1970 nanos value would land 1 µs high
        // of the true floor the oracle computes)
        df.withColumn("ts", timestamp_micros(
          expr("ts DIV 1000 - CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END")))
      case _ =>
        // NTZ→LTZ is wall-clock reinterpretation in the session TZ (UTC
        // here): exact micros preserved; a no-op when already LTZ
        df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
