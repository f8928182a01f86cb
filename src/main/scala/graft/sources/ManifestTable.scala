package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StructField, StructType}

/** MANIFEST-POINTER TABLES — the transactional commit the rewriting
  * operators (layout OPTIMIZE, artifact refresh snapshots) otherwise
  * lack on a plain filesystem: readers of a directory-listed table can
  * observe the delete-then-rename swap window mid-flight, so every
  * in-place rewrite in the engine documents a non-transactional window.
  * This module closes that gap the way the public table formats do
  * (Delta's `_delta_log`, Iceberg's metadata pointer): data files are
  * IMMUTABLE and uniquely named, and the table's contents are whatever
  * the newest committed MANIFEST lists — commit is ONE atomic rename of
  * a manifest file, so a reader resolves either the old version or the
  * new one, never a mixture.
  *
  * Layout under a table root:
  * {{{
  *   root/_manifests/v00000007.manifest   // header lines + one data-file entry per line
  *   root/data/c-<uuid>/part-*.parquet    // one subdir per commit
  * }}}
  *
  * Guarantees, and what they rest on:
  *  - '''Readers never see a partial table.''' A manifest is written to
  *    a temp name and RENAMED into place; rename of a single file is
  *    atomic on HDFS and POSIX. Staged data files are invisible until a
  *    manifest references them.
  *  - '''Crash safety.''' A writer that dies before its manifest rename
  *    leaves only unreferenced data files — the table still reads at the
  *    old version; [[vacuum]] collects the orphans.
  *  - '''Snapshot isolation + time travel.''' Commits never delete data
  *    files, so an old version stays readable ([[readAt]]) until
  *    [[vacuum]] retires it; a reader holding a resolved [[Snapshot]]
  *    is unaffected by concurrent commits. [[restore]] is the write-side
  *    twin: re-commit an old version's exact file list as the newest
  *    version (Delta's RESTORE), zero data IO.
  *  - '''Writer exclusivity''' is per-version: the first committer of
  *    `v{N}` wins. On HDFS the rename itself is atomic-and-exclusive
  *    (rename fails if the destination exists); the local filesystem's
  *    `rename(2)` REPLACES an existing destination, so exclusivity there
  *    rests on the pre-rename existence check — exact for the
  *    single-process `local[*]` harness, racy only across separate JVMs.
  *    Object stores need a conditional-PUT commit instead. This
  *    per-filesystem split is the same one Delta's pluggable LogStore
  *    documents; the protocol above is the common contract.
  *    [[append]] retries on a lost race (its staged files are still
  *    valid against the new base); [[overwrite]]/[[optimize]] ABORT
  *    (their output was computed from a snapshot that is now stale) and
  *    surface a ConcurrentModificationException for the caller to rerun.
  *  - '''Schema is part of the commit.''' A manifest records the table
  *    schema in a `#schema=` header; reads resolve against it (so a
  *    file written before an add-column evolution reads the new columns
  *    as null — by-name parquet resolution, no `mergeSchema` footer
  *    sweep), [[readAt]] returns each version's own schema, and
  *    [[append]]/[[mergeCoW]] enforce the evolution contract: adding
  *    trailing columns is supported, dropping or retyping a column is
  *    rejected loudly — never a silent column drop.
  *
  * The reference engine rewrites its outputs with a plain
  * delete-then-recreate (reference README.md's output-directory
  * lifecycle); this is the scale-grade replacement for every rewriting
  * surface at once. [[LayoutMaintenance]]'s in-place compactors remain
  * the catalog-table variants; [[optimize]] here is the same clustered
  * rewrite behind a real commit.
  */
object ManifestTable {

  /** A resolved table version: the immutable file list (and the schema
    * committed with it) a reader can keep using regardless of later
    * commits (until vacuumed). `files` are the DATA files;
    * `deleteFiles` the outstanding merge-on-read equality deletes
    * (format v6), applied by [[read]] as one anti-join on
    * `deleteCols` (one or more key columns — a composite equality
    * delete matches on the whole tuple, Iceberg's multi-column
    * equality-delete shape). */
  case class Snapshot(version: Int, files: Seq[String],
                      schema: Option[StructType],
                      deleteFiles: Seq[String] = Seq.empty,
                      deleteCols: Seq[String] = Seq.empty) {
    def read(spark: SparkSession): DataFrame = {
      require(files.nonEmpty, s"version $version lists no data files")
      applyDeletes(spark, readFiles(spark, files, schema),
        deleteFiles, deleteCols)
    }
  }

  /** Merge-on-read: suppress every row whose `deleteCols` TUPLE
    * appears in the outstanding delete files — one anti-join against
    * the delta-sized (auto-broadcast) distinct key set. Delete files
    * without the declaring header would be un-interpretable; fail
    * loudly rather than return resurrected rows. */
  private def applyDeletes(spark: SparkSession, df: DataFrame,
                           deleteFiles: Seq[String],
                           deleteCols: Seq[String]): DataFrame =
    if (deleteFiles.isEmpty) df
    else {
      if (deleteCols.isEmpty) throw new IllegalStateException(
        "manifest lists delete files but no #deletecol header names " +
          "their key column(s) — refusing to read resurrected rows")
      df.join(spark.read.parquet(deleteFiles: _*)
          .select(deleteCols.map(col): _*).distinct(),
        deleteCols, "left_anti")
    }

  /** Schema-aware file read: the stored schema resolves columns BY NAME
    * against each file, so pre-evolution files surface the later-added
    * columns as null without any `mergeSchema` footer sweep. */
  private def readFiles(spark: SparkSession, files: Seq[String],
                        schema: Option[StructType]): DataFrame =
    schema.map(s => spark.read.schema(s))
      .getOrElse(spark.read).parquet(files: _*)

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) =
    new Path(root, "_manifests")

  private def manifestPath(root: String, version: Int) =
    new Path(manifestDir(root), f"v$version%08d.manifest")

  private val ManifestName = """v(\d{8})\.manifest""".r

  /** Committed versions, ascending; empty for a not-yet-created table. */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val dir = manifestDir(root)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
      case ManifestName(v) => Some(v.toInt)
      case _ => None
    }).sorted
  }

  def currentVersion(spark: SparkSession, root: String): Option[Int] =
    versions(spark, root).lastOption

  /** Resolve a version (newest by default) to its immutable file list. */
  def snapshot(spark: SparkSession, root: String,
               version: Option[Int] = None): Snapshot = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed version under $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"version $v not present under $root (have ${vs.mkString(",")}) — " +
        "vacuumed or never committed")
    val fs = fsOf(spark, manifestDir(root))
    val m = loadManifest(fs, root, v)
    Snapshot(v, m.dataEntries.map(e => new Path(root, e.rel).toString),
      m.schema,
      m.deleteEntries.map(e => new Path(root, e.rel).toString),
      m.deleteCols)
  }

  /** The raw lines of a committed manifest (format-opaque — append
    * copies them verbatim so bounds/stats survive). */
  private def manifestLines(fs: FileSystem, root: String,
                            v: Int): Seq[String] =
    manifestLinesAt(fs, manifestPath(root, v))

  private def manifestLinesAt(fs: FileSystem, path: Path): Seq[String] = {
    val in = fs.open(path)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList
    finally in.close()
    lines.filter(_.nonEmpty)
  }

  /** One manifest entry: a root-relative data file, optionally carrying
    * per-file metadata stamped at write time —
    *  - format v1: `rel` (nothing known);
    *  - format v2: `rel<TAB>lo<TAB>hi` ([lo, hi] bounds of the integral
    *    key column the `#boundscol=` header names);
    *  - format v3: `rel<TAB>lo<TAB>hi<TAB>rows<TAB>bytes` (bounds may be
    *    `-` when the key was all-null or no bounds column was declared;
    *    rows/bytes are the file's row count and size);
    *  - format v4: v3 plus one `<TAB>lo<TAB>hi` pair per EXTRA stats
    *    column the `#statscols=` header names, in header order — the
    *    multi-column file statistics Iceberg/Delta ship, enabling
    *    file skipping on non-key predicates ([[readWhereRect]]).
    * All four coexist in one manifest, so old tables read fine and
    * every consumer falls back field-by-field ("unknown = may contain
    * any key" / "no stats = scan to count"). */
  private[sources] case class Entry(rel: String, lo: Option[Long],
                                    hi: Option[Long],
                                    rows: Option[Long] = None,
                                    bytes: Option[Long] = None,
                                    extra: Seq[Option[(Long, Long)]] =
                                      Seq.empty) {
    /** Format v6: a delete file is distinguished by its PATH prefix —
      * the line format itself is unchanged, so every older field
      * (stats, bounds) still parses. */
    def isDelete: Boolean = rel.startsWith("deletes/")
    def line: String = {
      def pair(p: Option[(Long, Long)]): String =
        p.map { case (a, b) => s"$a\t$b" }.getOrElse("-\t-")
      val b = (for (a <- lo; c <- hi) yield s"$a\t$c").getOrElse(
        if (rows.isDefined) "-\t-" else "")
      (rows, bytes) match {
        case (Some(r), Some(s)) =>
          (s"$rel\t$b\t$r\t$s" +: extra.map(pair)).mkString("\t")
        case _ => if (b.isEmpty) rel else s"$rel\t$b"
      }
    }
  }

  private def parseEntry(line: String): Entry = {
    def bounds(a: String, b: String): Option[(Long, Long)] =
      for (x <- a.toLongOption; y <- b.toLongOption) yield (x, y)
    line.split('\t') match {
      case f if f.length >= 5 && f.length % 2 == 1 =>
        val b = bounds(f(1), f(2))
        val extra = f.drop(5).grouped(2).toSeq
          .map(p => bounds(p(0), p(1)))
        Entry(f(0), b.map(_._1), b.map(_._2),
          f(3).toLongOption, f(4).toLongOption, extra)
      case Array(rel, a, b) =>
        val bd = bounds(a, b)
        Entry(rel, bd.map(_._1), bd.map(_._2))
      case _ => Entry(line, None, None)
    }
  }

  // -------------------------------------------------------------------
  // Manifest headers (`#key=value` lines before the entries)
  // -------------------------------------------------------------------

  /** Bounds are meaningless without knowing WHICH column they describe:
    * a v2+ manifest records it in a header line, and every bounds
    * consumer ([[mergeCoW]], [[readWhereKeyBetween]], [[readWhereKeyIn]])
    * honors the stored [lo, hi] ONLY when its own key column matches the
    * header — a mismatched key silently falls back to
    * unknown-bounds/read-everything (correct, just unpruned) instead of
    * pruning WRONG files. */
  private val BoundsKey = "boundscol"
  /** The committed table schema as `StructType.json` (one line, no tabs
    * or newlines) — the same role Delta's log metadata plays. */
  private val SchemaKey = "schema"
  /** The EXTRA stats columns (comma-joined, in entry-line pair order)
    * whose per-file [lo, hi] follow the v3 fields — format v4. */
  private val StatsKey = "statscols"
  /** Format v5: the columns (comma-joined) carrying per-file BLOOM
    * filters for point-lookup pruning ([[readWherePointEquals]]) —
    * min/max bounds can't skip anything for an equality probe on a
    * column the table is NOT clustered by (every file's [lo, hi] spans
    * the domain), which is exactly the case Parquet's bloom pages and
    * Delta's bloom index files exist for. Filters live in one sidecar
    * per commit directory per column (`data/c-<uuid>/_bloom.<col>`, a
    * filename → serialized-filter map), so they ride along with their
    * data files: [[append]] copies manifest lines verbatim and the
    * sidecars stay put; [[vacuum]] removes them with their commit dir.
    * A file without a sidecar entry (pre-v5 commit, or a writer that
    * couldn't stamp the column) is simply never skipped — the same
    * "unknown = may contain anything" fallback every other stat uses. */
  private val BloomKey = "bloomcols"
  /** Per-file false-positive rate; a false positive costs one wasted
    * file read, a false negative cannot happen — skipping is sound. */
  private val BloomFpp = 0.01
  /** Format v6: MERGE-ON-READ equality deletes (Iceberg's equality
    * delete files, the write-amplification complement to [[mergeCoW]]'s
    * copy-on-write). A delete commit stages the deleted KEYS as a
    * parquet file under `deletes/` — manifest entry lines distinguish
    * delete files from data files by that path prefix alone, so the
    * line format is unchanged — and every reader anti-joins the
    * (delta-sized, auto-broadcast) key set on the column this header
    * names. The contract is GLOBAL-UNTIL-COMPACTED: an equality delete
    * suppresses EVERY row of its key, past and future, until a
    * compaction ([[optimize]]) applies and drops it — so [[append]]
    * refuses keys in the outstanding delete set (resurrection needs a
    * compaction or a merge first). [[mergeCoW]]/[[mergeCoWKeys]]
    * SEQUENCE outstanding deletes when the merge key-set IS the delete
    * column-set — single column or whole tuple alike (rewrites read
    * through the delete set, changed keys leave it, survivors carry or
    * consolidate — an upsert is therefore the keyed resurrection
    * path); a merge on a DIFFERENT column-set cannot reconcile the two
    * key spaces and is rejected loudly instead of wrong. */
  private val DeleteKey = "deletecol"
  /** TRANSACTIONAL WRITER MARKERS (Delta's `txn` action shape): a
    * `#txn-<appId>=<version>` header records the highest version an
    * idempotent writer application has committed, ATOMICALLY with the
    * commit that carried it — the primitive an exactly-once streaming
    * sink needs (`foreachBatch` replays batches on recovery; a replayed
    * batch sees its version already recorded and becomes a no-op).
    * Markers ride every evolutionary commit (append, merge, delete,
    * optimize — compaction must not amnesia the sink's cursor) and are
    * reset only by [[overwrite]], which replaces the table outright. */
  private val TxnPrefix = "txn-"
  /** CHECK CONSTRAINTS (Delta's table constraints): a
    * `#constraint-<name>=<sql boolean expr>` header makes every
    * subsequent [[append]] and [[mergeCoW]] validate its incoming rows
    * BEFORE staging (fail fast, no orphan files, the table never holds
    * a violating row). SQL-standard semantics: a row violates only
    * when the expression evaluates to FALSE — NULL passes (add an
    * explicit IS NOT NULL conjunct to forbid nulls). [[addConstraint]]
    * scans the EXISTING table first, so a constraint can never be
    * declared over data that already violates it. Constraints ride
    * every evolutionary commit and reset only on [[overwrite]]. */
  private val ConstraintPrefix = "constraint-"
  /** NAMED TAGS (Iceberg's refs shape): a `#tag-<name>=<version>`
    * header pins a human-named version — `VERSION AS OF 'prod'`
    * through the SQL catalog, [[readAtTag]] in Scala. Tags ride every
    * evolutionary commit and are a RETENTION FLOOR: [[vacuum]] keeps
    * tagged versions' manifests and files whatever `retain` says, so
    * a tag never dangles. [[restore]] replicates an old version's
    * headers verbatim, so it rolls tags (like txn markers) back with
    * the content — the recovery primitive restores the WHOLE state;
    * [[overwrite]] resets them with everything else. */
  private val TagPrefix = "tag-"

  /** WRITABLE BRANCHES (Iceberg's write-audit-publish): a
    * `#branch-<name>=<baseVersion>` header on the MAIN chain declares
    * a branch forked at `baseVersion`; the branch's own commits live
    * as `branch-<name>-v%08d.manifest` files the main version regex
    * never matches — INVISIBLE to every main read until
    * [[publishBranch]] lands them as one main commit. Vacuum treats a
    * live branch like a tag (the base version is a retention floor,
    * the branch manifests' files stay referenced). */
  private val BranchPrefix = "branch-"

  /** COMMIT-KIND header: every commit stamps WHY it happened —
    * `append | overwrite | delete | compact | merge | restore |
    * rowdelete | rowupdate | metadata | publish` — the provenance the manifest
    * otherwise loses (a file diff says WHAT changed, never why). The
    * consumer that needs it is the streaming append tail's `skip`
    * policy ([[graft.streaming.RewriteCommitPolicy]]): a rewrite
    * commit is skippable exactly when it creates NO row the tail has
    * not already delivered — true for `compact` (a permutation of
    * delivered rows) and `rowdelete` (surviving rows only), false for
    * `merge` (upserts are new rows) and `rowupdate` (updated rows are
    * new row versions) — and the kind header is what makes that
    * decision provable instead of documented. Every commit OVERRIDES
    * the kind (never carried — [[restore]] replicates headers verbatim
    * and must still read `restore`); a manifest without the header is
    * a pre-kind commit and reads as unknown (consumers fail
    * conservatively). */
  private val KindKey = "commit-kind"

  /** The stamped kind of a committed version; None for pre-kind
    * manifests (unknown — consumers must treat it conservatively). */
  def commitKindOf(spark: SparkSession, root: String,
                   version: Int): Option[String] = {
    val fs = fsOf(spark, new Path(root))
    headersOf(fs, root, version).get(KindKey)
  }

  /** Headers that ride every evolutionary commit (append / merge /
    * delete / optimize) — writer cursors, constraints, and tags must
    * survive compaction; only [[overwrite]] resets them. */
  private def carriedHeaders(hs: Map[String, String]): Map[String, String] =
    hs.filter { case (k, _) =>
      k.startsWith(TxnPrefix) || k.startsWith(ConstraintPrefix) ||
        k.startsWith(TagPrefix) || k.startsWith(BranchPrefix) ||
        k == MaxFieldIdKey }

  /** One committed manifest, parsed ONCE — every operation loads this
    * a single time and derives headers/entries/schema from it, instead
    * of re-opening the file per accessor (three filesystem round-trips
    * per pruned read adds up on a remote store). */
  private case class ManifestData(headers: Map[String, String],
                                  entryLines: Seq[String]) {
    lazy val entries: Seq[Entry] = entryLines.map(parseEntry)
    def boundsCol: Option[String] = headers.get(BoundsKey)
    def statsCols: Seq[String] = headers.get(StatsKey)
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
    def bloomCols: Seq[String] = headers.get(BloomKey)
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
    def deleteCols: Seq[String] = headers.get(DeleteKey)
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
    /** The table's DATA files — every read plans from these. */
    def dataEntries: Seq[Entry] = entries.filterNot(_.isDelete)
    /** Outstanding merge-on-read delete files (format v6). */
    def deleteEntries: Seq[Entry] = entries.filter(_.isDelete)
    def schema: Option[StructType] = headers.get(SchemaKey)
      .map(j => DataType.fromJson(j).asInstanceOf[StructType])
    /** The stored [lo, hi] of `col` for one entry, from whichever
      * header declares it — the PRIMARY bounds column or an extra
      * stats column; None when this manifest carries no stats for it
      * (a mismatched column must never prune). */
    def boundsOf(e: Entry, col: String): Option[(Long, Long)] =
      if (boundsCol.contains(col)) for (a <- e.lo; b <- e.hi) yield (a, b)
      else statsCols.indexOf(col) match {
        case -1 => None
        case i => e.extra.lift(i).flatten
      }
    /** DATA entries with bounds (from either header source) resolved
      * for `keyCol` into the primary lo/hi slots. */
    def entriesFor(keyCol: String): Seq[Entry] =
      dataEntries.map { e =>
        val b = boundsOf(e, keyCol)
        e.copy(lo = b.map(_._1), hi = b.map(_._2))
      }
  }

  private def applyDeletes(spark: SparkSession, root: String,
                           df: DataFrame, m: ManifestData): DataFrame =
    applyDeletes(spark, df,
      m.deleteEntries.map(e => new Path(root, e.rel).toString),
      m.deleteCols)

  private def loadManifest(fs: FileSystem, root: String,
                           v: Int): ManifestData =
    loadManifestAt(fs, manifestPath(root, v))

  private def loadManifestAt(fs: FileSystem, path: Path): ManifestData = {
    val lines = manifestLinesAt(fs, path)
    val (hs, es) = lines.partition(_.startsWith("#"))
    ManifestData(
      hs.flatMap { l =>
        val eq = l.indexOf('=')
        if (eq < 0) None
        else Some(l.substring(1, eq) -> l.substring(eq + 1))
      }.toMap,
      es)
  }

  private def headersOf(fs: FileSystem, root: String,
                        v: Int): Map[String, String] =
    loadManifest(fs, root, v).headers

  private def headerLines(hs: Map[String, String]): Seq[String] =
    hs.toSeq.sortBy(_._1).map { case (k, v) => s"#$k=$v" }

  /** The bounds column a committed manifest's [lo, hi] values describe,
    * if any. */
  def boundsColOf(spark: SparkSession, root: String,
                  version: Option[Int] = None): Option[String] = {
    val fs = fsOf(spark, new Path(root))
    val v = version.orElse(currentVersion(spark, root))
    v.flatMap(headersOf(fs, root, _).get(BoundsKey))
  }

  private def headerOf(fs: FileSystem, root: String,
                       v: Int): Option[String] =
    loadManifest(fs, root, v).boundsCol

  private def schemaOf(fs: FileSystem, root: String,
                       v: Int): Option[StructType] =
    loadManifest(fs, root, v).schema

  /** The schema a version committed with (None for pre-schema-header
    * tables, whose reads fall back to parquet's own resolution). */
  def schemaAt(spark: SparkSession, root: String,
               version: Option[Int] = None): Option[StructType] = {
    val fs = fsOf(spark, new Path(root))
    version.orElse(currentVersion(spark, root))
      .flatMap(schemaOf(fs, root, _))
  }

  /** Every field stored nullable: a pre-evolution file genuinely lacks
    * the later columns, so the committed schema must admit null there. */
  private def asNullable(s: StructType): StructType =
    StructType(s.fields.map(_.copy(nullable = true)))

  // -------------------------------------------------------------------
  // FIELD IDS (Iceberg's stable-column-identity idea on parquet's own
  // mechanism): every column of a table created from round 19 on
  // carries a stable id in its field metadata under parquet's
  // `parquet.field.id` key — Spark's writer stamps the ids into the
  // files (spark.sql.parquet.fieldId.write.enabled, default on) and,
  // with spark.sql.parquet.fieldId.read.enabled (set by
  // [[graft.GraftSession]]), the reader resolves requested columns BY
  // ID instead of by name. That makes RENAME a header-only commit (the
  // committed schema changes the name, the id keeps pointing at the
  // same physical column in every old file) and DROP a projection mask
  // (the field leaves the schema; a later re-ADD of the same name gets
  // a FRESH id, so the dropped column's old values never resurface).
  // Ids are never reused: the high-water mark rides the
  // `#maxfieldid=` header (max-of-schema would recycle the id of a
  // dropped newest column). Tables created before field-id stamping
  // (no ids in the committed schema) keep by-name resolution and
  // reject rename/drop loudly.
  // -------------------------------------------------------------------
  private val FieldIdKey = "parquet.field.id"
  private val MaxFieldIdKey = "maxfieldid"

  private def hasFieldIds(s: StructType): Boolean =
    s.fields.nonEmpty && s.fields.forall(_.metadata.contains(FieldIdKey))

  private def withFieldId(f: StructField, id: Long): StructField =
    f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(f.metadata).putLong(FieldIdKey, id).build())

  private def stampFieldIds(s: StructType): StructType =
    StructType(s.fields.zipWithIndex.map { case (f, i) =>
      withFieldId(f, i + 1L) })

  /** `df` re-expressed in `s`'s column order WITH `s`'s field metadata
    * — the write-side half of field-id resolution: every staged data
    * file must carry the ids the committed schema declares, whatever
    * transformations (which drop metadata on replaced columns) built
    * the frame. A no-op for id-less (legacy) schemas. */
  private def alignToSchema(df: DataFrame, s: StructType): DataFrame =
    df.select(s.fields.map(f =>
      col(f.name).as(f.name, f.metadata)).toSeq: _*)

  /** The table's field-id high-water mark (never decreases, never
    * reused — see the block comment above). */
  private def maxFieldIdOf(headers: Map[String, String],
                           schema: Option[StructType]): Long =
    headers.get(MaxFieldIdKey).flatMap(_.toLongOption)
      .orElse(schema.filter(hasFieldIds).map(
        _.fields.map(_.metadata.getLong(FieldIdKey)).max))
      .getOrElse(0L)

  private def manifestEntries(fs: FileSystem, root: String,
                              v: Int): Seq[Entry] =
    loadManifest(fs, root, v).entries

  /** Per-file (relative path, bounds, rows, bytes) of a committed
    * version — the metadata the stats consumers and tools read. */
  def fileStats(spark: SparkSession, root: String,
                version: Option[Int] = None)
      : Seq[(String, Option[(Long, Long)], Option[Long], Option[Long])] = {
    val fs = fsOf(spark, new Path(root))
    val v = version.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalArgumentException(s"no committed version under $root"))
    // DATA files only: an equality-delete file's bytes/rows would
    // otherwise leak indistinguishably into size-based planning
    // (optimizeBySize would size the post-delete output from
    // data+delete bytes); delete-side accounting lives in [[history]]
    manifestEntries(fs, root, v).filterNot(_.isDelete).map(e =>
      (e.rel, for (a <- e.lo; b <- e.hi) yield (a, b), e.rows, e.bytes))
  }

  /** The table's row count FROM MANIFEST METADATA ALONE — no data file
    * is opened, the answer a format's statistics exist for. None when
    * any entry predates v3 stats (an honest "don't know", never a
    * partial sum). */
  def rowCountFromStats(spark: SparkSession, root: String,
                        version: Option[Int] = None): Option[Long] = {
    val fs = fsOf(spark, new Path(root))
    val v = version.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalArgumentException(s"no committed version under $root"))
    val es = manifestEntries(fs, root, v)
    // outstanding equality deletes make the per-file counts an upper
    // bound only (a delete key may match 0..n rows) — no metadata-only
    // answer exists; fall back to a scan
    if (es.exists(_.isDelete)) None
    else if (es.isEmpty || es.exists(_.rows.isEmpty)) None
    else Some(es.map(_.rows.get).sum)
  }

  /** The table at its newest committed version. */
  def read(spark: SparkSession, root: String): DataFrame =
    snapshot(spark, root).read(spark)

  /** Bounds-pruned RANGE READ — the read-side payoff of manifest format
    * v2+: resolve the newest version, keep only the files whose stored
    * [lo, hi] key bounds intersect `[lo, hi]` (v1/bounds-less entries
    * are always kept — unknown means "may contain anything"), and apply
    * the residual row filter on what remains. File-level skipping from
    * the MANIFEST alone — no footer reads, no directory listing beyond
    * the one manifest — the same plan a format's data-skipping
    * statistics drive; parquet row-group stats still prune WITHIN the
    * kept files. Returns an empty (correctly-typed) relation when no
    * file qualifies. */
  def readWhereKeyBetween(spark: SparkSession, root: String,
                          keyCol: String, lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"empty range [$lo, $hi]")
    prunedRead(spark, root, keyCol,
      e => e.lo.get <= hi && e.hi.get >= lo,
      col(keyCol) >= lo && col(keyCol) <= hi)
  }

  /** [[readWhereKeyBetween]]'s SET twin: files whose bounds contain ANY
    * of `keys` (plus the residual `isin` filter) — the pruned read a
    * partition-replacement consumer wants. */
  def readWhereKeyIn(spark: SparkSession, root: String,
                     keyCol: String, keys: Seq[Long]): DataFrame = {
    require(keys.nonEmpty, "empty key set")
    val sorted = keys.sorted.toArray
    // any key inside [lo, hi]: the first key >= lo must be <= hi
    def hits(lo: Long, hi: Long): Boolean = {
      var a = 0; var b = sorted.length - 1
      if (sorted(b) < lo) return false
      while (a < b) { // first index with key >= lo
        val mid = (a + b) >>> 1
        if (sorted(mid) < lo) a = mid + 1 else b = mid
      }
      sorted(a) <= hi
    }
    prunedRead(spark, root, keyCol,
      e => hits(e.lo.get, e.hi.get),
      col(keyCol).isin(keys: _*))
  }

  /** MULTI-COLUMN rectangle read (format v4's payoff): keep only the
    * files whose stored per-column [lo, hi] intersect EVERY requested
    * range — a file is skipped as soon as ONE dimension's stats rule it
    * out, so a clustered layout whose files are hyper-rectangles (the
    * Z-order layout) gets genuine multi-dimensional skipping from the
    * MANIFEST alone, before any footer is opened. Ranges are in each
    * column's stored stats unit (integral value, or epoch MICROS for a
    * timestamp column — the residual filter converts back via
    * `timestamp_micros`, which pushes to the parquet scan). Columns
    * without stored stats never prune (unknown = may contain anything). */
  def readWhereRect(spark: SparkSession, root: String,
                    ranges: Seq[(String, Long, Long)]): DataFrame = {
    require(ranges.nonEmpty, "empty range list")
    ranges.foreach { case (k, lo, hi) =>
      require(lo <= hi, s"empty range [$lo, $hi] on $k") }
    val fs = fsOf(spark, new Path(root))
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed version under $root"))
    val m = loadManifest(fs, root, v)
    require(m.dataEntries.nonEmpty,
      s"version $v of $root lists no data files")
    val kept = m.dataEntries.filter(e => ranges.forall { case (k, lo, hi) =>
      m.boundsOf(e, k).forall { case (flo, fhi) => flo <= hi && fhi >= lo }
    })
    def residual(k: String, lo: Long, hi: Long) = {
      val isTs = m.schema.exists(_(k).dataType ==
        org.apache.spark.sql.types.TimestampType)
      if (isTs) col(k) >= timestamp_micros(lit(lo)) &&
        col(k) <= timestamp_micros(lit(hi))
      else col(k) >= lo && col(k) <= hi
    }
    val pred = ranges.map { case (k, lo, hi) => residual(k, lo, hi) }
      .reduce(_ && _)
    if (kept.isEmpty)
      readFiles(spark,
        Seq(new Path(root, m.dataEntries.head.rel).toString),
        m.schema).where(lit(false))
    else
      applyDeletes(spark, root,
        readFiles(spark, kept.map(e =>
          new Path(root, e.rel).toString), m.schema).where(pred), m)
  }

  /** POINT-LOOKUP read (format v5's payoff): `column IN (values)`
    * pruned by BOTH metadata tiers — per-file [lo, hi] stats first
    * (free, already loaded), then the per-file Bloom filters when the
    * table declares `column` in `#bloomcols=`. The bloom tier is what
    * makes this useful on a column the table is NOT clustered by:
    * there every file's [lo, hi] spans the whole domain and stats keep
    * everything, while the filters skip every file the probe value is
    * definitely absent from (false positives cost one wasted read at
    * the stamped 1% rate; false negatives cannot happen). Values are in
    * the column's stored stats unit (integral value, or epoch MICROS
    * for a timestamp column — the residual filter compares via
    * `timestamp_micros`, which pushes to the parquet scan). One sidecar
    * open per commit directory, not per file. */
  def readWherePointIn(spark: SparkSession, root: String,
                       column: String, values: Seq[Long]): DataFrame = {
    require(values.nonEmpty, "empty probe-value set")
    val fs = fsOf(spark, new Path(root))
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed version under $root"))
    val m = loadManifest(fs, root, v)
    val entries = m.entriesFor(column)
    require(entries.nonEmpty, s"version $v of $root lists no data files")
    val statsKept = entries.filter(e =>
      e.lo.isEmpty || e.hi.isEmpty ||
        values.exists(x => e.lo.get <= x && x <= e.hi.get))
    val kept =
      if (!m.bloomCols.contains(column)) statsKept
      else {
        val cache = scala.collection.mutable.Map
          .empty[String, Map[String, org.apache.spark.util.sketch.BloomFilter]]
        statsKept.filter { e =>
          val slash = e.rel.lastIndexOf('/')
          val (dirRel, name) =
            (e.rel.substring(0, math.max(0, slash)),
              e.rel.substring(slash + 1))
          val blooms = cache.getOrElseUpdate(dirRel,
            readBloomSidecar(fs,
              new Path(new Path(root, dirRel), s"_bloom.$column")))
          // no sidecar entry (pre-v5 file) => may contain anything
          blooms.get(name).forall(b => values.exists(b.mightContainLong))
        }
      }
    val isTs = m.schema.exists(_(column).dataType ==
      org.apache.spark.sql.types.TimestampType)
    val pred =
      if (isTs) values.map(x => col(column) === timestamp_micros(lit(x)))
        .reduce(_ || _)
      else col(column).isin(values: _*)
    if (kept.isEmpty)
      readFiles(spark, Seq(new Path(root, entries.head.rel).toString),
        m.schema).where(lit(false))
    else
      applyDeletes(spark, root,
        readFiles(spark, kept.map(e =>
          new Path(root, e.rel).toString), m.schema).where(pred), m)
  }

  def readWherePointEquals(spark: SparkSession, root: String,
                           column: String, value: Long): DataFrame =
    readWherePointIn(spark, root, column, Seq(value))

  /** The SQL catalog's scan ([[GraftCatalog]]): one pruned, pinned-
    * version read shaped by what Spark's planner pushed down —
    * `requiredCols` (column pruning reaches the parquet scan),
    * `ranges` (per-column [lo, hi] constraints derived from the pushed
    * filters, pruning FILES from the manifest's v2/v4 stats before any
    * footer is opened — columns without stored stats never prune), and
    * `residual` (the pushed filters re-expressed as one Column so
    * parquet row-group stats prune WITHIN the kept files; Spark
    * re-applies every filter post-scan regardless, so a dropped
    * residual costs IO, never correctness). Outstanding equality
    * deletes are applied before projection — SQL readers see exactly
    * what [[read]] serves. */
  private[graft] def sqlScan(spark: SparkSession, root: String,
                             version: Option[Int],
                             requiredCols: Seq[String],
                             ranges: Map[String, (Long, Long)],
                             residual: Option[org.apache.spark.sql.Column])
      : DataFrame = {
    val fs = fsOf(spark, new Path(root))
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed version under $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"version $v not present under $root (have ${vs.mkString(",")}) — " +
        "vacuumed or never committed")
    val m = loadManifest(fs, root, v)
    require(m.dataEntries.nonEmpty,
      s"version $v of $root lists no data files")
    val kept = m.dataEntries.filter(e => ranges.forall {
      case (c, (lo, hi)) => m.boundsOf(e, c).forall {
        case (flo, fhi) => flo <= hi && fhi >= lo }
    })
    val base =
      if (kept.isEmpty)
        readFiles(spark,
          Seq(new Path(root, m.dataEntries.head.rel).toString),
          m.schema).where(lit(false))
      else
        applyDeletes(spark, root,
          readFiles(spark, kept.map(e =>
            new Path(root, e.rel).toString), m.schema), m)
    val filtered = residual.map(base.where).getOrElse(base)
    // an empty projection is the `count(*)` shape: zero columns, rows
    // preserved (RowDataSourceScanExec counts the empty rows)
    filtered.select(requiredCols.map(col): _*)
  }

  /** Shared bounds-pruned read: keep files whose (present AND
    * header-matching) bounds satisfy `boundsHit`; files with unknown or
    * differently-keyed bounds are always read (unknown = may contain
    * anything). */
  private def prunedRead(spark: SparkSession, root: String, keyCol: String,
                         boundsHit: Entry => Boolean,
                         pred: org.apache.spark.sql.Column): DataFrame = {
    val fs = fsOf(spark, new Path(root))
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed version under $root"))
    val m = loadManifest(fs, root, v)
    // bounds honored ONLY when the manifest declares them for keyCol
    val entries = m.entriesFor(keyCol)
    require(entries.nonEmpty, s"version $v of $root lists no data files")
    val schema = m.schema
    val kept = entries.filter(e =>
      e.lo.isEmpty || e.hi.isEmpty || boundsHit(e))
    if (kept.isEmpty)
      // preserve the schema from one (skipped) file, with zero rows
      readFiles(spark, Seq(new Path(root, entries.head.rel).toString),
        schema).where(lit(false))
    else
      applyDeletes(spark, root,
        readFiles(spark, kept.map(e =>
          new Path(root, e.rel).toString), schema).where(pred), m)
  }

  /** Time travel: the table exactly as of `version` (that version's own
    * schema included). */
  def readAt(spark: SparkSession, root: String, version: Int): DataFrame =
    snapshot(spark, root, Some(version)).read(spark)

  /** Bounds/stats stamping accepts only integral key columns: a
    * non-numeric column's values would aggregate under the column's
    * NATIVE ordering and the long cast could still succeed (numeric
    * strings sort "10" < "9"), producing bounds that prune WRONG files
    * — silently. Fail fast instead. */
  private def isIntegral(dt: DataType): Boolean =
    Seq(ByteType, ShortType, IntegerType, LongType).contains(dt)

  private def requireIntegral(schema: StructType, k: String): Unit = {
    val dt = schema(k).dataType
    require(isIntegral(dt),
      s"boundsCol $k must be an integral column (bounds are stored as " +
        s"long [lo, hi] in the table's sort order); got $dt — a " +
        "non-integral column's native ordering would stamp bounds that " +
        "prune wrong files")
  }

  /** The aggregation expression that turns a column into its stored
    * long stats value: integral columns cast (BEFORE aggregating, so
    * [lo, hi] ordering is numeric), timestamps become epoch MICROS
    * (matching `TIMESTAMP_MICROS` parquet encoding; consumers compare
    * via `timestamp_micros`). Anything else is rejected — a
    * collation-ordered min/max would prune wrong files. */
  private def statExpr(schema: StructType,
                       k: String): org.apache.spark.sql.Column = {
    val dt = schema(k).dataType
    if (isIntegral(dt)) col(k).cast("long")
    else if (dt == org.apache.spark.sql.types.TimestampType)
      unix_micros(col(k))
    else throw new IllegalArgumentException(
      s"stats column $k must be integral or timestamp (stats are " +
        s"stored as long [lo, hi] in numeric order); got $dt")
  }

  // -------------------------------------------------------------------
  // Bloom sidecars (format v5)
  // -------------------------------------------------------------------

  /** Sidecar layout: `writeInt(n)` then n × (`writeUTF(fileName)`,
    * `writeInt(len)`, filter bytes) — one file per commit dir per
    * column, marker-prefixed so data listings and [[vacuum]]'s
    * per-file sweep never see it as data. */
  private def writeBloomSidecar(fs: FileSystem, path: Path,
                                blooms: Seq[(String, Array[Byte])]): Unit = {
    val out = new java.io.DataOutputStream(fs.create(path, true))
    try {
      out.writeInt(blooms.size)
      blooms.foreach { case (name, bytes) =>
        out.writeUTF(name)
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    } finally out.close()
  }

  /** Missing sidecar (pre-v5 commit) → empty map → nothing skipped. */
  private def readBloomSidecar(fs: FileSystem, path: Path)
      : Map[String, org.apache.spark.util.sketch.BloomFilter] = {
    if (!fs.exists(path)) return Map.empty
    val in = new java.io.DataInputStream(fs.open(path))
    try {
      val n = in.readInt()
      (0 until n).map { _ =>
        val name = in.readUTF()
        val bytes = new Array[Byte](in.readInt())
        in.readFully(bytes)
        name -> org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(bytes))
      }.toMap
    } finally in.close()
  }

  /** Write `df`'s rows as immutable files under a fresh commit subdir and
    * return their manifest entry lines — NOT yet visible to any reader
    * (no manifest references them until a commit does). Every line
    * carries format-v3 stats (row count + size); `boundsCol` adds the
    * per-file [lo, hi] key bounds, `statsCols` one extra [lo, hi] pair
    * per column (format v4), `bloomCols` one per-file Bloom filter per
    * column in the commit dir's sidecars (format v5). */
  /** Per-file ([lo, hi] stat pairs for `statNames`, row count) read
    * from the parquet footers of just-written files — zero Spark jobs,
    * zero data IO. Returns None (caller falls back to the aggregate
    * pass) unless EVERY requested column in EVERY file is a stat shape
    * the manifest stores exactly: signed INT32/INT64 (Spark
    * byte/short/int/long) or INT64 TIMESTAMP(MICROS) (the engine's
    * pinned parquet output type, whose footer min/max ARE `unix_micros`
    * values). Chunks of an all-null column carry no min/max but a set
    * null count — they contribute nothing, exactly like the old
    * `min/max` aggregates; a chunk with statistics MISSING (not
    * written) forces the fallback rather than guessing. Zero-row files
    * are omitted from the map — the caller drops them from the
    * manifest, as before. */
  private def footerStats(fs: FileSystem, dir: Path, names: Seq[String],
                          statNames: Seq[String])
      : Option[Map[String, (Seq[Option[(Long, Long)]], Long)]] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.LogicalTypeAnnotation
    def servable(pt: org.apache.parquet.schema.PrimitiveType): Boolean =
      pt.getPrimitiveTypeName match {
        case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
          pt.getLogicalTypeAnnotation match {
            case null => true
            case a: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
              a.isSigned
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              pt.getPrimitiveTypeName == PrimitiveTypeName.INT64 &&
                t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS
            case _ => false
          }
        case _ => false
      }
    def longOf(v: Any): Long = v match {
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l.longValue
      case other => throw new IllegalStateException(
        s"unexpected footer stat type ${other.getClass}")
    }
    val out = Map.newBuilder[String, (Seq[Option[(Long, Long)]], Long)]
    for (name <- names) {
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new Path(dir, name), fs.getConf))
      try {
        val footer = reader.getFooter
        import scala.jdk.CollectionConverters._
        val blocks = footer.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        if (rows > 0) {
          val fileSchema = footer.getFileMetaData.getSchema
          val pairs: Seq[Option[(Long, Long)]] = statNames.map { k =>
            // a column the file doesn't carry at top level must go
            // through the aggregate pass's loud resolution error, not
            // silently stamp unprunable (None) bounds
            if (!fileSchema.containsField(k)) return None
            var lo = Long.MaxValue; var hi = Long.MinValue; var seen = false
            for (b <- blocks; cc <- b.getColumns.asScala
                 if cc.getPath.size == 1 && cc.getPath.toArray.head == k) {
              if (!servable(cc.getPrimitiveType)) return None
              val st = cc.getStatistics
              if (st != null && st.hasNonNullValue) {
                lo = math.min(lo, longOf(st.genericGetMin))
                hi = math.max(hi, longOf(st.genericGetMax))
                seen = true
              } else if (st == null || !st.isNumNullsSet ||
                  st.getNumNulls != cc.getValueCount) {
                // stats absent (vs. a provably all-null chunk) — don't
                // guess; the aggregate pass recomputes them exactly
                return None
              }
            }
            if (seen) Some((lo, hi)) else None
          }
          out += name -> ((pairs, rows))
        }
      } finally reader.close()
    }
    Some(out.result())
  }

  private def stage(spark: SparkSession, root: String,
                    write: String => Unit,
                    allowEmpty: Boolean = false,
                    boundsCol: Option[String] = None,
                    statsCols: Seq[String] = Seq.empty,
                    bloomCols: Seq[String] = Seq.empty,
                    relPrefix: String = "data"): Seq[String] = {
    val rel = s"$relPrefix/c-${UUID.randomUUID().toString.take(12)}"
    val dir = new Path(root, rel)
    write(dir.toString)
    val fs = fsOf(spark, dir)
    val staged = fs.listStatus(dir).toSeq
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map(f => f.getPath.getName -> f.getLen).toMap
    require(allowEmpty || staged.nonEmpty, "commit staged zero data files")
    if (staged.isEmpty) return Seq.empty
    // per-file stats for the manifest (formats v3/v4), taken from the
    // parquet FOOTERS the write just produced (optimization guide §1/§6
    // — the footers already hold exact typed min/max and row counts, so
    // re-scanning the staged files was one full Spark job per commit,
    // paid by EVERY write in the engine: append, merge, compaction,
    // every streaming micro-batch apply). Footer min/max for signed
    // INT32/INT64 and TIMESTAMP(MICROS) — the only stat shapes
    // [[statExpr]] admits, and the engine pins TIMESTAMP_MICROS output
    // — are bit-exact equals of the old `min(cast(k as long))`
    // aggregates, so the manifest lines are byte-identical
    // (ManifestFooterStatsSpec pins the equality). Any other shape, or
    // a footer without statistics, falls back to the aggregate pass —
    // which also owns the loud non-integral type rejection.
    lazy val justWritten = spark.read.parquet(dir.toString)
    val statNames: Seq[String] = boundsCol.toSeq ++ statsCols
    def aggregateStats(): Map[String, (Seq[Option[(Long, Long)]], Long)] = {
      boundsCol.foreach(k => requireIntegral(justWritten.schema, k))
      val statCols: Seq[(String, org.apache.spark.sql.Column)] =
        boundsCol.map(k => k -> col(k).cast("long")).toSeq ++
          statsCols.map(k => k -> statExpr(justWritten.schema, k))
      val aggs = statCols.zipWithIndex.flatMap { case ((_, e), i) =>
        Seq(min(e).as(s"_lo$i"), max(e).as(s"_hi$i"))
      } :+ count(lit(1)).as("_n")
      justWritten
        .groupBy(input_file_name().as("_f"))
        .agg(aggs.head, aggs.tail: _*)
        .collect().map { r =>
          val pairs = statCols.indices.map { i =>
            if (r.isNullAt(1 + 2 * i) || r.isNullAt(2 + 2 * i)) None
            else Some((r.getLong(1 + 2 * i), r.getLong(2 + 2 * i)))
          }
          new Path(r.getString(0)).getName ->
            ((pairs, r.getLong(1 + 2 * statCols.size)))
        }.toMap
    }
    val perFile: Map[String, (Seq[Option[(Long, Long)]], Long)] =
      footerStats(fs, dir, staged.keys.toSeq, statNames)
        .getOrElse(aggregateStats())
    // format v5: one Bloom filter per file per declared column. TWO
    // more passes reading only the bloom columns: a per-file DISTINCT
    // count (a filter holds a SET — sizing by row count would pay the
    // ~10 bits/entry tax once per duplicate occurrence; BloomProbe
    // measured the repeat factor directly on lineitem), then the
    // filters themselves sized PER COLUMN by that column's largest
    // per-file distinct count (a global max across columns would
    // oversize every low-cardinality column's sidecars by the widest
    // column's factor). The filter aggregation can't fold into the
    // distinct pass — a Bloom filter's bit array is allocated from
    // `expected` BEFORE any value is inserted. The per-file filters
    // come back through the driver, which writes one sidecar per
    // column into the commit dir — at this design's driver-manifest
    // scale that's the same shape as the stats collect (a production
    // format emits per-file sidecars from the writer tasks themselves).
    if (bloomCols.nonEmpty && perFile.nonEmpty) {
      val dAggs = bloomCols.zipWithIndex.map { case (k, i) =>
        countDistinct(statExpr(justWritten.schema, k)).as(s"_d$i") }
      val dRows = justWritten
        .groupBy(input_file_name().as("_f"))
        .agg(dAggs.head, dAggs.tail: _*)
        .collect()
      val expectedPerCol = bloomCols.indices.map(i =>
        math.max(1L, dRows.iterator.map(_.getLong(1 + i)).max))
      val bAggs = bloomCols.zipWithIndex.map { case (k, i) =>
        graft.functions.BloomAgg.sketch(
          statExpr(justWritten.schema, k), expectedPerCol(i), BloomFpp)
          .as(s"_b$i")
      }
      val rows = justWritten
        .groupBy(input_file_name().as("_f"))
        .agg(bAggs.head, bAggs.tail: _*)
        .collect()
      bloomCols.zipWithIndex.foreach { case (k, i) =>
        writeBloomSidecar(fs, new Path(dir, s"_bloom.$k"),
          rows.toSeq.map(r => new Path(r.getString(0)).getName ->
            r.getAs[Array[Byte]](1 + i)).sortBy(_._1))
      }
    }
    def entryOf(name: String, bytes: Long,
                pairs: Seq[Option[(Long, Long)]], n: Long): Entry = {
      val (primary, extra) =
        if (boundsCol.isDefined) (pairs.head, pairs.tail)
        else (None, pairs)
      Entry(s"$rel/$name", primary.map(_._1), primary.map(_._2),
        Some(n), Some(bytes), extra)
    }
    val lines = staged.toSeq.sortBy(_._1).flatMap { case (name, bytes) =>
      perFile.get(name) match {
        case Some((pairs, n)) => Some(entryOf(name, bytes, pairs, n).line)
        // ZERO rows (no group at all): a writer task that got an empty
        // partition — the file contributes nothing, drop it from the
        // manifest rather than carrying an unprunable line
        case None => None
      }
    }
    // an all-empty write (zero rows total) must NOT silently commit a
    // zero-entry manifest: keep the raw file list (schema preserved,
    // rows stamped 0) so the table stays readable as a zero-row relation
    if (lines.isEmpty)
      staged.toSeq.sortBy(_._1).map { case (name, bytes) =>
        Entry(s"$rel/$name", None, None, Some(0L), Some(bytes)).line }
    else lines
  }

  /** In-process serialization of the check-then-rename window: the
    * local filesystem's `rename(2)` replaces an existing destination,
    * so two same-JVM committers could otherwise both "win" one version
    * and silently drop a manifest. Cross-PROCESS exclusivity is the
    * filesystem's job (see the object scaladoc). */
  private val commitLock = new Object

  /** Atomic-rename commit of version `v`; false = lost the race (a
    * manifest for `v` already exists). See the object scaladoc for the
    * per-filesystem exclusivity contract. `headers` lead the file
    * (`#boundscol=` declaring which column the lines' [lo, hi]
    * describe, `#schema=` the committed schema). The temp manifest is
    * deleted on ANY failure path — a throwing write must not leak
    * `.tmp-*` junk into `_manifests` forever ([[vacuum]] sweeps aged
    * stragglers as a backstop). */
  private def tryCommit(fs: FileSystem, root: String, v: Int,
                        relFiles: Seq[String],
                        headers: Map[String, String]): Boolean =
    tryCommitPath(fs, root, manifestPath(root, v), relFiles, headers)

  private def tryCommitPath(fs: FileSystem, root: String, target: Path,
                            relFiles: Seq[String],
                            headers: Map[String, String]): Boolean = {
    if (fs.exists(target)) return false
    val tmp = new Path(manifestDir(root),
      s".tmp-${UUID.randomUUID().toString.take(12)}")
    val lines = headerLines(headers) ++ relFiles
    val won =
      try {
        val out = fs.create(tmp, false)
        try out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
        finally out.close()
        commitLock.synchronized {
          !fs.exists(target) && fs.rename(tmp, target)
        }
      } catch {
        case e: Throwable =>
          scala.util.Try(fs.delete(tmp, false))
          throw e
      }
    if (!won) fs.delete(tmp, false)
    won
  }

  private def boundsHeader(boundsCol: Option[String]): Map[String, String] =
    boundsCol.map(BoundsKey -> _).toMap

  /** Create the table (version 1) or REPLACE its contents: the new
    * manifest lists only this commit's files. Fails if another writer
    * committed after the base was resolved — the caller computed against
    * a stale snapshot and must rerun. Pass `expectedBase` when the
    * replacement was derived from a specific version read earlier (the
    * read-modify-write shape): the commit then targets exactly
    * `expectedBase + 1` and aborts if anything landed in between, rather
    * than silently dropping the interleaved commit's rows. */
  def overwrite(spark: SparkSession, root: String, df: DataFrame,
                expectedBase: Option[Int] = None,
                boundsCol: Option[String] = None,
                statsCols: Seq[String] = Seq.empty,
                bloomCols: Seq[String] = Seq.empty): Int = {
    val fs = fsOf(spark, new Path(root))
    val base = expectedBase.getOrElse(currentVersion(spark, root)
      .getOrElse(0))
    // fail fast BEFORE the data write: an invalid bounds/stats/bloom
    // column must not burn a full table write and strand it as orphans
    boundsCol.foreach(k => requireIntegral(df.schema, k))
    (statsCols ++ bloomCols).foreach(k => statExpr(df.schema, k))
    // (re)creation stamps fresh field ids 1..n — the stable column
    // identities every later rename/drop resolves against
    val outSchema = stampFieldIds(asNullable(df.schema))
    val dfOut = alignToSchema(df, outSchema)
    val staged = stage(spark, root, dir => dfOut.write.parquet(dir),
      boundsCol = boundsCol, statsCols = statsCols, bloomCols = bloomCols)
    val headers = boundsHeader(boundsCol) ++
      (if (statsCols.nonEmpty) Map(StatsKey -> statsCols.mkString(","))
       else Map.empty[String, String]) ++
      (if (bloomCols.nonEmpty) Map(BloomKey -> bloomCols.mkString(","))
       else Map.empty[String, String]) +
      (SchemaKey -> outSchema.json) +
      (MaxFieldIdKey -> outSchema.fields.length.toString) +
      (KindKey -> "overwrite")
    if (!tryCommit(fs, root, base + 1, staged, headers))
      throw new java.util.ConcurrentModificationException(
        s"version ${base + 1} of $root was committed concurrently; " +
          "this overwrite was computed from a stale base — rerun it")
    base + 1
  }

  /** The widened table schema an append with `incoming` produces against
    * `stored`, enforcing the evolution contract: every stored column
    * must arrive with the same type (dropping or retyping is rejected —
    * never a silent column drop / type flip), NEW columns append after
    * the stored ones (old files read them as null). */
  private def evolvedSchema(stored: StructType, incoming: StructType,
                            root: String,
                            maxFieldId: Long = 0L): StructType = {
    val inByName = incoming.fields.map(f => f.name -> f.dataType).toMap
    val missing = stored.fields.map(_.name).filterNot(inByName.contains)
    require(missing.isEmpty,
      s"append to $root is missing table columns ${missing.mkString(", ")}" +
        " — schema evolution supports ADDING columns only; write every " +
        "existing column (use overwrite to redefine the table)")
    val retyped = stored.fields.filter(f =>
      inByName(f.name) != f.dataType)
    require(retyped.isEmpty,
      s"append to $root changes column types: " +
        retyped.map(f => s"${f.name} ${f.dataType} -> ${inByName(f.name)}")
          .mkString(", ") +
        " — the schema contract is exact: cast the frame to the " +
        "committed types (after a widening, send the WIDE type); to " +
        "change the TABLE's types use widenColumn (lossless) or " +
        "overwrite (anything else)")
    val newFields0 = incoming.fields.filterNot(f =>
      stored.fieldNames.contains(f.name))
    // new columns: FRESH ids off the high-water mark on an id-stamped
    // table; on a legacy table any metadata riding in from a foreign
    // read is STRIPPED (a stale foreign id would mis-resolve) — the
    // evolved schema must be all-ids or no-ids, never mixed
    val newFields =
      if (hasFieldIds(stored))
        newFields0.zipWithIndex.map { case (f, i) =>
          withFieldId(f, maxFieldId + i + 1L) }
      else newFields0.map(stripFieldId)
    asNullable(StructType(stored.fields ++ newFields))
  }

  private def stripFieldId(f: StructField): StructField =
    if (!f.metadata.contains(FieldIdKey)) f
    else f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(f.metadata).remove(FieldIdKey).build())

  /** The schema with every field id removed — for reading DELETE files
    * under the table shape: delete files are key-only and id-LESS
    * (their key columns can never be renamed — requireIdEvolvable
    * rejects), so they resolve by name; requesting ids over them would
    * fail loudly for nothing. */
  private def stripFieldIds(s: StructType): StructType =
    StructType(s.fields.map(stripFieldId))

  /** Append `df`'s rows: new manifest = base manifest + this commit's
    * files. Staged files stay valid whatever the base becomes, so a lost
    * commit race just re-reads the newest manifest and retries.
    * Add-column schema evolution happens here: a `df` carrying every
    * table column plus new ones widens the committed schema (old files
    * read the additions as null); a `df` missing or retyping a table
    * column is rejected loudly. */
  def append(spark: SparkSession, root: String, df: DataFrame,
             maxAttempts: Int = 20,
             boundsCol: Option[String] = None): Int = {
    val fs = fsOf(spark, new Path(root))
    // ONE manifest parse for every pre-staging decision (the
    // ManifestData single-parse discipline): bounds header, bloom
    // declaration, committed schema, delete guard, constraints
    val v0 = currentVersion(spark, root)
    val m0 = v0.map(loadManifest(fs, root, _))
    val h0 = m0.flatMap(_.boundsCol)
    // stamp bounds only when they will MEAN the table's declared bounds
    // column — stamping a different column under the base's header
    // would misattribute the values (the format's one hard rule)
    val effBounds = boundsCol.filter(b => h0.forall(_ == b))
    // the table's declared BLOOM columns auto-stamp on every append —
    // a maintained index, not a per-writer choice — but only those this
    // df can stamp (present, stampable type); the rest degrade to
    // sidecar-less files (never skipped — correct, just unpruned)
    val effBloom = m0.map(_.bloomCols).getOrElse(Seq.empty)
      .filter(k => df.schema.fieldNames.contains(k) &&
        scala.util.Try(statExpr(df.schema, k)).isSuccess)
    // evolution contract and bounds-type gate checked BEFORE staging
    // (fail fast, no orphan files); the commit loop re-derives the
    // evolution per attempt for races. The evolved schema is resolved
    // HERE because the staged files must carry ITS field ids — a
    // creation-by-append stamps fresh ids exactly like overwrite.
    effBounds.foreach(k => requireIntegral(df.schema, k))
    def evolve(m: Option[ManifestData], noBase: Boolean)
        : Option[(StructType, Long)] = m.flatMap(_.schema) match {
      case Some(stored) =>
        val mx = maxFieldIdOf(m.get.headers, Some(stored))
        val s = evolvedSchema(stored, df.schema, root, mx)
        Some((s, if (hasFieldIds(s))
          mx + (s.fields.length - stored.fields.length) else 0L))
      case None if noBase =>
        val s = stampFieldIds(asNullable(df.schema))
        Some((s, s.fields.length.toLong))
      case None => None
    }
    val evolved0 = evolve(m0, v0.isEmpty)
    // RESURRECTION GUARD (format v6) + CHECK constraints, validated
    // against a SPECIFIC base manifest — the commit loop re-runs this
    // whenever it lands on a base OTHER than the one validated (a
    // racing delete/addConstraint between validation and commit must
    // not slip pre-deleted or violating rows in: TOCTOU-safe).
    def validateAgainst(m: ManifestData): Unit = {
      if (m.deleteEntries.nonEmpty && m.deleteCols.nonEmpty) {
        val ks = m.deleteCols
        // the guard joins on ks, so the incoming df must carry them — a
        // schema-less legacy table would otherwise surface a raw
        // AnalysisException from the USING join instead of the contract
        val missing = ks.filterNot(df.schema.fieldNames.contains)
        require(missing.isEmpty,
          s"append to $root must carry the delete column(s) " +
            s"${missing.mkString(", ")} while equality deletes are " +
            "outstanding (the resurrection guard checks incoming " +
            s"keys); got columns ${df.schema.fieldNames.mkString(", ")}")
        val delKeys = spark.read.parquet(m.deleteEntries.map(e =>
          new Path(root, e.rel).toString): _*)
          .select(ks.map(col): _*).distinct()
        require(df.join(delKeys, ks, "left_semi").take(1).isEmpty,
          s"append to $root would resurrect equality-deleted " +
            s"(${ks.mkString(", ")}) tuples — the delete is global " +
            "until compacted; run optimize first, then append")
      }
      val cs = m.headers.collect {
        case (hk, hv) if hk.startsWith(ConstraintPrefix) =>
          hk.stripPrefix(ConstraintPrefix) -> hv
      }.toMap
      if (cs.nonEmpty) validateConstraints(df, cs, s"append to $root")
    }
    m0.foreach(validateAgainst)
    var validatedBase = v0
    val dfOut = evolved0.map { case (s, _) => alignToSchema(df, s) }
      .getOrElse(df)
    val staged = stage(spark, root, dir => dfOut.write.parquet(dir),
      boundsCol = effBounds, bloomCols = effBloom)
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = versions(spark, root).lastOption
      val bm = base.map(loadManifest(fs, root, _))
      if (base != validatedBase) { // a racing commit changed the table
        bm.foreach(validateAgainst)
        validatedBase = base
      }
      val h = bm.flatMap(_.boundsCol).orElse(effBounds)
      // the base header governs the combined manifest: staged lines
      // were stamped for effBounds, so strip their bounds (stats stay)
      // if a racing commit changed the table's bounds column underneath
      val stagedOut =
        if (effBounds.isEmpty || h == effBounds) staged
        else staged.map(l => parseEntry(l).copy(lo = None, hi = None).line)
      // schema evolution against the base's committed schema; a base
      // without one (legacy table) stays schema-less. When field ids
      // are in play the staged files were written with evolved0's ids
      // — a racing commit that changed the id assignment (a different
      // evolution landed first) makes those files WRONG for this
      // base's schema: abort instead of committing misattributed ids.
      val evolvedB = evolve(bm, base.isEmpty)
      if (evolved0.exists(e => hasFieldIds(e._1)) || evolvedB.exists(e =>
          hasFieldIds(e._1))) {
        if (evolvedB.map(_._1.json) != evolved0.map(_._1.json))
          throw new java.util.ConcurrentModificationException(
            s"append to $root raced a schema change (field ids " +
              "reassigned under the staged files); rerun the append")
      }
      val outSchema = evolvedB.map(_._1)
      val baseLines = bm.map(_.entryLines).getOrElse(Seq.empty)
      val v = base.getOrElse(0) + 1
      val headers = boundsHeader(h) ++
        // the base's extra-stats header survives: its lines keep their
        // pairs; this commit's new lines carry none (unknown = read)
        bm.flatMap(_.headers.get(StatsKey)).map(StatsKey -> _).toMap ++
        // likewise the bloom declaration: base files keep their
        // sidecars in place, this commit's were stamped above
        bm.flatMap(_.headers.get(BloomKey)).map(BloomKey -> _).toMap ++
        // and the delete column: base delete lines carry verbatim
        bm.flatMap(_.headers.get(DeleteKey)).map(DeleteKey -> _).toMap ++
        // writer markers + constraints: an append must not amnesia a
        // sink's cursor or shed the table's invariants
        bm.map(m => carriedHeaders(m.headers)).getOrElse(Map.empty) ++
        // the id high-water mark moves with the evolution (overrides
        // the carried value; ids are never reused)
        evolvedB.filter(e => hasFieldIds(e._1))
          .map(e => MaxFieldIdKey -> e._2.toString).toMap ++
        outSchema.map(SchemaKey -> _.json).toMap + (KindKey -> "append")
      if (tryCommit(fs, root, v, baseLines ++ stagedOut, headers)) return v
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"append to $root lost $maxAttempts commit races")
  }

  /** RESTORE an earlier version as the NEWEST commit (Delta's RESTORE /
    * Iceberg's rollback): the new manifest replicates version
    * `toVersion`'s headers and entry lines VERBATIM — zero data IO, one
    * rename — so history keeps moving forward (the restored-away
    * versions stay time-travelable until vacuumed). The recovery
    * primitive for a multi-table transaction whose later commits never
    * landed: roll the tables that DID commit back to the coordinated
    * version. Restoring across an OUTSTANDING equality delete drops the
    * delete file while carrying the data files verbatim — a pure
    * un-delete, which [[readChangesBetween]] surfaces as 'insert' rows
    * of the resurrected keys (see its scaladoc) so CDF consumers stay
    * coherent. */
  def restore(spark: SparkSession, root: String, toVersion: Int): Int = {
    val fs = fsOf(spark, new Path(root))
    val vs = versions(spark, root)
    require(vs.contains(toVersion),
      s"cannot restore $root to $toVersion (have ${vs.mkString(",")})")
    val m = loadManifest(fs, root, toVersion)
    val v = vs.last + 1
    // headers replicate verbatim EXCEPT the kind: this commit is a
    // restore whatever the target version's commit was
    if (!tryCommit(fs, root, v, m.entryLines,
        m.headers + (KindKey -> "restore")))
      throw new java.util.ConcurrentModificationException(
        s"restore of $root lost the commit race for version $v; rerun")
    v
  }

  /** MERGE-ON-READ DELETE (format v6): commit the distinct `keyCol`
    * values of `keys` as an equality delete file — O(delta) work and
    * ZERO data-file IO, the write-amplification complement to
    * [[mergeCoW]] (which rewrites every affected file). Every reader
    * from this version on anti-joins the outstanding delete set;
    * [[optimize]] APPLIES the deletes (its rewrite reads through the
    * snapshot) and drops them, restoring a delete-free table.
    * Contract (see [[DeleteKey]]): deletes are GLOBAL until compacted —
    * [[append]] refuses to resurrect a deleted key; [[mergeCoW]]
    * sequences outstanding deletes when keyed on this same column and
    * refuses otherwise. One delete column per table; a second call
    * must use the same `keyCol`. */
  def deleteWhereKeyIn(spark: SparkSession, root: String,
                       keyCol: String, keys: DataFrame,
                       maxAttempts: Int = 20): Int =
    deleteWhereKeysIn(spark, root, Seq(keyCol), keys, maxAttempts)

  /** The COMPOSITE-key twin (Iceberg's multi-column equality deletes):
    * `keyCols` together form the equality tuple — a row is suppressed
    * when its WHOLE tuple appears in the delete set. One delete
    * column-set per table; later delete commits must use the same
    * set. Resurrection: [[mergeCoWKeys]] keyed on exactly this
    * column-set sequences the outstanding tuples (upsert = keyed
    * resurrection), or [[optimize]] applies and drops them. */
  def deleteWhereKeysIn(spark: SparkSession, root: String,
                        keyCols: Seq[String], keys: DataFrame,
                        maxAttempts: Int = 20): Int = {
    require(keyCols.nonEmpty, "need at least one delete key column")
    require(keyCols.distinct == keyCols, s"duplicate delete columns " +
      s"in ${keyCols.mkString(", ")}")
    keyCols.foreach(k => require(!k.contains(','),
      s"delete column name '$k' cannot contain ',' (header format)"))
    val fs = fsOf(spark, new Path(root))
    val v0 = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed version under $root"))
    val m0 = loadManifest(fs, root, v0)
    require(m0.deleteCols.isEmpty || m0.deleteCols == keyCols,
      s"table $root already carries equality deletes on " +
        s"(${m0.deleteCols.mkString(", ")}); one delete column-set per " +
        s"table (got ${keyCols.mkString(", ")})")
    val delKeys = keys.select(keyCols.map { k =>
      m0.schema.map(sc => col(k).cast(sc(k).dataType))
        .getOrElse(col(k)).as(k)
    }: _*).distinct()
    require(delKeys.where(keyCols.map(col(_).isNull).reduce(_ || _))
      .take(1).isEmpty,
      "null keys cannot be equality-deleted (the anti-join would " +
        "never match them)")
    val staged = stage(spark, root,
      dir => delKeys.coalesce(1).write.parquet(dir),
      relPrefix = "deletes")
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = versions(spark, root).last
      val bm = loadManifest(fs, root, base)
      require(bm.deleteCols.isEmpty || bm.deleteCols == keyCols,
        s"a concurrent commit set the delete columns of $root to " +
          bm.deleteCols.mkString(", "))
      val headers = bm.headers + (DeleteKey -> keyCols.mkString(",")) +
        (KindKey -> "delete")
      if (tryCommit(fs, root, base + 1, bm.entryLines ++ staged, headers))
        return base + 1
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"delete on $root lost $maxAttempts commit races")
  }

  /** The file-level CHANGE SET between two committed versions: entries
    * in `toVersion`'s manifest but not `fromVersion`'s (added) and vice
    * versa (removed) — O(manifest) work, the commit literally wrote
    * these lists. Because [[mergeCoW]] carries unchanged files verbatim
    * (same path), the change set of a merge is delta-file-sized, never
    * table-sized. */
  def changedFiles(spark: SparkSession, root: String,
                   fromVersion: Int, toVersion: Int)
      : (Seq[String], Seq[String]) = {
    require(fromVersion < toVersion,
      s"need fromVersion < toVersion, got $fromVersion >= $toVersion")
    val fs = fsOf(spark, new Path(root))
    val from = manifestEntries(fs, root, fromVersion).map(_.rel).toSet
    val to = manifestEntries(fs, root, toVersion).map(_.rel).toSet
    ((to -- from).toSeq.sorted, (from -- to).toSeq.sorted)
  }

  /** CHANGED-FILES/CDC READ — the incremental-consumer story (Delta's
    * Change Data Feed shape, computed from the manifests): every row of
    * a file ADDED in `(fromVersion, toVersion]` tagged
    * `_change = 'insert'`, every row of a file REMOVED tagged
    * `_change = 'delete'`. File-level granularity: a copy-on-write
    * rewrite lists its old file as removed and its new file as added,
    * so a row the rewrite merely CARRIED appears on both sides — a
    * row-level consumer reconciles by key (delete∖insert = removed,
    * insert∖delete = added, both-with-different-payload = modified),
    * which is delta-file-sized work because carried FILES never appear
    * at all. Each side reads with ITS version's committed schema, and
    * the two align by name (post-evolution reads of pre-evolution
    * deletes surface the new columns as null). */
  def readChangesBetween(spark: SparkSession, root: String,
                         fromVersion: Int, toVersion: Int): DataFrame = {
    val fs = fsOf(spark, new Path(root))
    val (added, removed) = changedFiles(spark, root, fromVersion, toVersion)
    def side(rels: Seq[String], v: Int, tag: String,
             deleteSide: Boolean = false): DataFrame = {
      val m = loadManifest(fs, root, v)
      // delete files are key-only and id-less: resolve them by NAME
      // under the table shape (see stripFieldIds)
      val s = if (deleteSide) m.schema.map(stripFieldIds) else m.schema
      val base =
        if (rels.nonEmpty)
          readFiles(spark,
            rels.map(r => new Path(root, r).toString), s)
        else {
          // zero changed files on this side: an empty, correctly-typed
          // relation (schema from the version's header, or any file)
          require(m.dataEntries.nonEmpty,
            s"version $v of $root lists no data files")
          readFiles(spark,
            Seq(new Path(root, m.dataEntries.head.rel).toString),
            s).where(lit(false))
        }
      base.withColumn("_change", lit(tag))
    }
    // format v6: an ADDED equality-delete file IS a batch of deletes —
    // its rows surface tagged 'delete' with only the delete-key column
    // populated (by-name resolution against the table schema nulls the
    // rest). A REMOVED delete file is an UN-DELETE for every key that
    // does not reappear in an added delete file (a consolidation
    // carries survivors forward) — and the resurrected ROWS must
    // surface as 'insert' exactly once:
    //  - rows living in ADDED data files (a rewrite re-surfaced them)
    //    are already emitted above — nothing extra;
    //  - rows living in CARRIED files (restore's shape: delete files
    //    dropped, data files untouched — or the carried remainder of a
    //    partial rewrite) are emitted HERE: the carried files
    //    semi-joined to the un-deleted key set. Suppressed-elsewhere
    //    keys can't leak: the un-deleted set is anti-joined against
    //    toVersion's WHOLE outstanding delete set (carried delete
    //    files included), so every semi-join key is genuinely live.
    def isDel(rel: String) = rel.startsWith("deletes/")
    val base = side(added.filterNot(isDel), toVersion, "insert")
      .unionByName(side(added.filter(isDel), toVersion, "delete",
          deleteSide = true),
        allowMissingColumns = true)
      .unionByName(side(removed.filterNot(isDel), fromVersion, "delete"),
        allowMissingColumns = true)
    val undropped = removed.filter(isDel)
    if (undropped.isEmpty) base
    else {
      val mFrom = loadManifest(fs, root, fromVersion)
      val ks = mFrom.deleteCols
      if (ks.isEmpty) throw new IllegalStateException(
        s"version $fromVersion of $root lists delete files but no " +
          "#deletecol header")
      val oldKeys = spark.read.parquet(undropped.map(r =>
        new Path(root, r).toString): _*)
        .select(ks.map(col): _*).distinct()
      val mTo = loadManifest(fs, root, toVersion)
      // a key is UN-deleted only when it is absent from toVersion's
      // WHOLE outstanding delete set — added delete files alone are
      // not enough: two delete commits can hold overlapping keys, and
      // a restore across the later one removes deletes/d2 while
      // CARRYING deletes/d1, so a shared key must stay suppressed (an
      // added-only anti-join would emit it as a false 'insert' and a
      // CDC mirror would resurrect it)
      val outstanding = mTo.deleteEntries.map(e =>
        new Path(root, e.rel).toString)
      val unDeleted =
        if (outstanding.isEmpty) oldKeys
        else oldKeys.join(spark.read.parquet(outstanding: _*)
          .select(ks.map(col): _*).distinct(), ks, "left_anti")
      val addedSet = added.toSet
      val carried = mTo.dataEntries.map(_.rel)
        .filterNot(addedSet.contains)
      if (carried.isEmpty) base
      else base.unionByName(
        readFiles(spark, carried.map(r =>
            new Path(root, r).toString), mTo.schema)
          .join(unDeleted, ks, "left_semi")
          .withColumn("_change", lit("insert")),
        allowMissingColumns = true)
    }
  }

  /** Transactional OPTIMIZE — the clustered compaction
    * ([[LayoutMaintenance.compactClustered]]'s plan: one range exchange
    * + in-file sort on `clusterCol`, restoring per-file min-max pruning)
    * behind a manifest commit: the rewritten files become version N+1 in
    * one rename, the pre-compaction version stays readable until
    * [[vacuum]], and a concurrent commit aborts the swap (stale base)
    * instead of clobbering it. Pass `targetFiles` explicitly, or
    * `targetFileBytes` to SIZE-BALANCE from the manifest's v3 stats
    * (total bytes / target size, metadata-only — no listing, no scan;
    * stat-less legacy entries fall back to the current file count).
    * Returns (newVersion, filesBefore, filesAfter). */
  def optimize(spark: SparkSession, root: String, clusterCol: String,
               targetFiles: Int): (Int, Int, Int) =
    optimizeImpl(spark, root, clusterCol, targetFiles)

  def optimizeBySize(spark: SparkSession, root: String, clusterCol: String,
                     targetFileBytes: Long): (Int, Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val stats = fileStats(spark, root)
    val n =
      if (stats.exists(_._4.isEmpty)) stats.size
      else {
        val total = stats.map(_._4.get).sum
        math.max(1, ((total + targetFileBytes - 1) / targetFileBytes).toInt)
      }
    optimizeImpl(spark, root, clusterCol, n)
  }

  private def optimizeImpl(spark: SparkSession, root: String,
                           clusterCol: String,
                           targetFiles: Int): (Int, Int, Int) = {
    val fs = fsOf(spark, new Path(root))
    val base = snapshot(spark, root)
    // the rewrite clusters on clusterCol, so stamp bounds on it — every
    // line is fresh, so the header switches cleanly. Stamping by DEFAULT
    // also prevents the silent downgrade where compacting a
    // bounds-stamped table strips all its pruning. A NON-integral
    // cluster column degrades to stats-only lines (no bounds, no
    // header) — never collation-ordered bounds that would prune wrong
    // files on a later merge.
    val pinned = base.read(spark)
    val stampCol = Some(clusterCol)
      .filter(c => isIntegral(pinned.schema(c).dataType))
    // ONE manifest parse for everything the compaction must preserve
    val m = loadManifest(fs, root, base.version)
    // the table's bloom AND extra-stats declarations survive a
    // compaction: every line is fresh, so re-stamp both for the new
    // files — compacting must never silently strip a pruning tier
    def stampable(k: String) = pinned.schema.fieldNames.contains(k) &&
      scala.util.Try(statExpr(pinned.schema, k)).isSuccess
    val bloomCs = m.bloomCols.filter(stampable)
    val statsCs = m.statsCols.filter(stampable)
    val staged = stage(spark, root, dir =>
      pinned
        .repartitionByRange(targetFiles, col(clusterCol))
        .sortWithinPartitions(clusterCol)
        .write.parquet(dir), boundsCol = stampCol,
      statsCols = statsCs, bloomCols = bloomCs)
    val headers = boundsHeader(stampCol) ++
      (if (bloomCs.nonEmpty) Map(BloomKey -> bloomCs.mkString(","))
       else Map.empty[String, String]) ++
      (if (statsCs.nonEmpty) Map(StatsKey -> statsCs.mkString(","))
       else Map.empty[String, String]) ++
      // writer markers + constraints: compaction must not amnesia a
      // sink's cursor or shed the table's invariants
      carriedHeaders(m.headers) ++
      base.schema.map(SchemaKey -> _.json).toMap + (KindKey -> "compact")
    if (!tryCommit(fs, root, base.version + 1, staged, headers))
      throw new java.util.ConcurrentModificationException(
        s"optimize of $root lost the commit race for version " +
          s"${base.version + 1}; rerun against the new base")
    (base.version + 1, base.files.size, staged.size)
  }

  /** OPTIMIZE ZORDER BY (Delta's shape): the transactional compaction
    * with a TWO-dimensional layout — see [[optimizeZOrderCols]], the
    * N-dimensional general form this delegates to. */
  def optimizeZOrder(spark: SparkSession, root: String,
                     xCol: String, yCol: String,
                     targetFiles: Int): (Int, Int, Int) =
    optimizeZOrderCols(spark, root, Seq(xCol, yCol), targetFiles)

  /** N-DIMENSIONAL OPTIMIZE ZORDER BY: the rewrite orders by the
    * Morton interleave of ALL `cols`' domain buckets
    * ([[ZOrderLayout.zValueN]]; exact integer arithmetic throughout,
    * in each column's stored stats unit — each dimension bucketed to
    * the same 10-bit scale so the interleave alternates between
    * dimensions at every level) and stamps EVERY column's per-file
    * [lo, hi] as v4 multi-column stats, so the files become tight
    * N-dimensional hyper-rectangles and [[readWhereRect]] — or a SQL
    * `WHERE` through [[GraftCatalog]], whose pushed filters drive the
    * same stats — skips in all N dimensions from the manifest alone.
    * Up to 6 dimensions (6 x 10 bucket bits in one signed long; in
    * practice 2-4 — each added dimension halves the per-dimension
    * resolution the same file count can express, the classic z-order
    * trade Delta documents). Everything else is [[optimize]]'s
    * contract: one atomic commit, outstanding equality deletes applied
    * and dropped (the rewrite reads through the snapshot), blooms
    * re-stamped, carried headers preserved, old version readable until
    * vacuum. The output schema is UNCHANGED (the z-value is a sort
    * key, never a column). */
  def optimizeZOrderCols(spark: SparkSession, root: String,
                         cols: Seq[String],
                         targetFiles: Int): (Int, Int, Int) = {
    require(cols.size >= 2 && cols.distinct == cols,
      s"z-order needs >= 2 distinct columns, got ${cols.mkString(", ")}")
    require(cols.size <= 6,
      s"z-order supports at most 6 dimensions (10 bucket bits each " +
        s"in one signed long), got ${cols.size}")
    val fs = fsOf(spark, new Path(root))
    val base = snapshot(spark, root)
    val m = loadManifest(fs, root, base.version)
    val pinned = base.read(spark)
    // the z-bucket needs each dimension as an exact LONG expression in
    // its stats unit — the same unit statExpr stamps, so the stamped
    // v4 stats and the layout agree. The bigint cast is load-bearing
    // for narrow integral columns: (c - lo) * 1024 evaluated in a
    // 32-bit column's native type overflows silently once the domain
    // exceeds ~2^21, producing negative buckets and a garbage curve
    // (results stay correct — the stats are stamped from real values —
    // but the pruning the layout sells collapses with no diagnostics).
    def unitSql(c: String): String = {
      statExpr(pinned.schema, c) // type gate: fails loudly on others
      if (pinned.schema(c).dataType ==
          org.apache.spark.sql.types.TimestampType) s"unix_micros(`$c`)"
      else s"CAST(`$c` AS BIGINT)"
    }
    val units = cols.map(unitSql)
    val mmAggs = units.flatMap(u => Seq(
      min(expr(u)).cast("long"), max(expr(u)).cast("long")))
    val mm = pinned.agg(mmAggs.head, mmAggs.tail: _*).head()
    require(!mm.anyNull,
      s"cannot z-order $root on all-null ${cols.mkString("/")}")
    val buckets = units.zipWithIndex.map { case (u, i) =>
      val (lo, hi) = (mm.getLong(2 * i), mm.getLong(2 * i + 1))
      expr(ZOrderLayout.zBucketSql(u, lo.toString,
        (hi - lo + 1).toString, "DIV"))
    }
    val zv = ZOrderLayout.zValueN(buckets)
    def stampable(k: String) = pinned.schema.fieldNames.contains(k) &&
      scala.util.Try(statExpr(pinned.schema, k)).isSuccess
    val bloomCs = m.bloomCols.filter(stampable)
    val staged = stage(spark, root, dir =>
      pinned
        .repartitionByRange(targetFiles, zv)
        .sortWithinPartitions(zv)
        .write.parquet(dir),
      statsCols = cols, bloomCols = bloomCs)
    val headers = Map(StatsKey -> cols.mkString(",")) ++
      (if (bloomCs.nonEmpty) Map(BloomKey -> bloomCs.mkString(","))
       else Map.empty[String, String]) ++
      carriedHeaders(m.headers) ++
      base.schema.map(SchemaKey -> _.json).toMap + (KindKey -> "compact")
    if (!tryCommit(fs, root, base.version + 1, staged, headers))
      throw new java.util.ConcurrentModificationException(
        s"optimizeZOrder of $root lost the commit race for version " +
          s"${base.version + 1}; rerun against the new base")
    (base.version + 1, base.files.size, staged.size)
  }

  /** COPY-ON-WRITE MERGE — the `MERGE INTO` shape the public table
    * formats put behind their commit: apply row-level deletes and
    * upserts keyed on `keyCol` by rewriting ONLY the data files that
    * contain a changed key; every other file is carried VERBATIM into
    * the new manifest (same path, zero IO). Affected files are found
    * from the MANIFEST's per-file key bounds when the table was written
    * with `boundsCol` (format v2+): a delta-sized distributed interval
    * stabbing against the O(files) broadcast bounds — no snapshot scan
    * at all, the same plan Delta/Iceberg run off their file statistics.
    * Entries without bounds (v1 lines, or writes that skipped
    * `boundsCol`) fall back to one key-column-only scan of just those
    * files tagged with `input_file_name`. New keys (pure inserts) need
    * no affected file; they land in the rewrite commit's fresh files,
    * which are themselves bounds-stamped so the NEXT merge prunes too.
    * Readers keep snapshot isolation throughout: the merge is one
    * manifest rename, old versions stay readable, and a concurrent
    * commit aborts this merge (stale base) instead of losing either
    * side's rows.
    *
    * `removeKeys` is a 1-column (`keyCol`) relation; `upserts` carries
    * full rows (an update = its key in neither/either — upsert rows
    * REPLACE any existing row with the same key) and must carry EXACTLY
    * the table's columns — an extra column is rejected (schema widens
    * via [[append]]/[[overwrite]], never silently dropped here), a
    * missing one fails resolution. Returns
    * (newVersion, filesCarried, filesRewritten). */
  /** The table's declared CHECK constraints, name → SQL expression. */
  def constraintsOf(spark: SparkSession, root: String)
      : Map[String, String] = {
    val fs = fsOf(spark, new Path(root))
    currentVersion(spark, root)
      .map(v => loadManifest(fs, root, v).headers.collect {
        case (k, v2) if k.startsWith(ConstraintPrefix) =>
          k.stripPrefix(ConstraintPrefix) -> v2
      }.toMap).getOrElse(Map.empty)
  }

  /** A row violates only when the expression is FALSE (SQL-standard
    * CHECK semantics: NULL passes). One `take(1)` job per constraint —
    * delta-sized for append/merge inputs, table-sized only in
    * [[addConstraint]]'s declaration scan. */
  private def validateConstraints(df: DataFrame,
                                  cs: Map[String, String],
                                  what: String): Unit =
    cs.foreach { case (name, sql) =>
      val bad = df.where(!coalesce(expr(sql), lit(true))).take(1)
      require(bad.isEmpty,
        s"$what violates CHECK constraint $name ($sql): " +
          s"e.g. ${bad.headOption.map(_.toString).getOrElse("")}")
    }

  /** Declare a CHECK constraint (see [[ConstraintPrefix]]): scans the
    * EXISTING table first — a constraint can never be declared over
    * violating data — then commits the header (entry lines verbatim,
    * zero data IO). */
  def addConstraint(spark: SparkSession, root: String, name: String,
                    exprSql: String): Int = {
    requireTxnId(name) // same identifier alphabet
    require(!exprSql.contains('\n') && !exprSql.contains('\t'),
      "constraint expression must be a single line (header format)")
    val fs = fsOf(spark, new Path(root))
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed version under $root"))
    validateConstraints(read(spark, root), Map(name -> exprSql),
      s"existing data of $root")
    val m = loadManifest(fs, root, v)
    if (!tryCommit(fs, root, v + 1, m.entryLines,
        m.headers + ((ConstraintPrefix + name) -> exprSql) +
          (KindKey -> "metadata")))
      throw new java.util.ConcurrentModificationException(
        s"addConstraint on $root lost the commit race; rerun")
    v + 1
  }

  /** Drop a CHECK constraint — header-only commit, zero data IO. */
  def dropConstraint(spark: SparkSession, root: String,
                     name: String): Int = {
    val fs = fsOf(spark, new Path(root))
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed version under $root"))
    val m = loadManifest(fs, root, v)
    require(m.headers.contains(ConstraintPrefix + name),
      s"no constraint named $name on $root")
    if (!tryCommit(fs, root, v + 1, m.entryLines,
        m.headers - (ConstraintPrefix + name) + (KindKey -> "metadata")))
      throw new java.util.ConcurrentModificationException(
        s"dropConstraint on $root lost the commit race; rerun")
    v + 1
  }

  /** ADD-COLUMN SCHEMA EVOLUTION AS A HEADER-ONLY COMMIT (`ALTER TABLE
    * ... ADD COLUMN` — the DDL twin of [[append]]'s evolution-on-
    * write): the new manifest lists the SAME files and widens only the
    * committed `#schema=` header — zero data IO; old files read the
    * additions as null, exactly the state an evolving append leaves
    * them in. New columns are forced NULLABLE (no existing row carries
    * them). Name collisions — including case-insensitive ones, which
    * SQL resolution would conflate — schema-less legacy tables, and
    * empty additions reject loudly; rename / drop ride field ids
    * ([[renameColumn]]/[[dropColumn]]) and retyping is sound only as
    * a lossless widening ([[widenColumn]]). */
  def addColumns(spark: SparkSession, root: String,
                 cols: Seq[StructField]): Int = {
    require(cols.nonEmpty, s"addColumns to $root needs a column")
    require(cols.map(_.name.toLowerCase).distinct.size == cols.size,
      s"addColumns to $root: duplicate new column names " +
        cols.map(_.name).mkString(", "))
    val fs = fsOf(spark, new Path(root))
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"no committed version under $root"))
    val m = loadManifest(fs, root, v)
    val stored = m.schema.getOrElse(
      throw new UnsupportedOperationException(
        s"$root has no committed #schema= header (legacy table) — " +
          "any append/overwrite stamps one; evolve after that"))
    val clash = cols.map(_.name).filter(n =>
      stored.fieldNames.exists(_.equalsIgnoreCase(n)))
    require(clash.isEmpty,
      s"addColumns to $root: column(s) ${clash.mkString(", ")} " +
        "already exist (rename/retype is not supported — evolution " +
        "is add-only)")
    // on an id-stamped table the additions get FRESH ids off the
    // high-water mark (never a reused id — a re-added name must not
    // resurface the dropped column's old values); legacy tables stay
    // id-less (any foreign metadata stripped)
    val mx = maxFieldIdOf(m.headers, Some(stored))
    val added =
      if (hasFieldIds(stored))
        cols.zipWithIndex.map { case (f, i) =>
          withFieldId(f.copy(nullable = true), mx + i + 1L) }
      else cols.map(f => stripFieldId(f.copy(nullable = true)))
    val widened = asNullable(StructType(stored.fields ++ added))
    val maxHdr =
      if (hasFieldIds(stored))
        Map(MaxFieldIdKey -> (mx + cols.length).toString)
      else Map.empty[String, String]
    if (!tryCommit(fs, root, v + 1, m.entryLines,
        m.headers ++ maxHdr + (SchemaKey -> widened.json) +
          (KindKey -> "metadata")))
      throw new java.util.ConcurrentModificationException(
        s"addColumns on $root lost the commit race; rerun")
    v + 1
  }

  /** The shared gate for header-only schema evolution: the column must
    * exist and hold no pruning/delete ROLE (those headers attribute by
    * NAME), and no CHECK constraint may reference it (constraint
    * expressions are SQL text — a silent rewrite could change
    * semantics). RENAME/DROP additionally require the table to be
    * field-id-stamped and the session to resolve by id (`needIds` —
    * a renamed column would silently null under by-name resolution);
    * WIDENING does not (the name never changes, so by-name resolution
    * of the narrow physical column under the wide requested type stays
    * sound on legacy tables too). */
  private def requireIdEvolvable(spark: SparkSession, root: String,
                                 m: ManifestData, colName: String,
                                 what: String,
                                 needIds: Boolean = true): StructType = {
    val stored = m.schema.getOrElse(
      throw new UnsupportedOperationException(
        s"$what on $root: no committed #schema= header (legacy " +
          "table) — any append/overwrite stamps one; evolve after " +
          "that"))
    if (needIds && !hasFieldIds(stored))
      throw new UnsupportedOperationException(
        s"$what on $root: the table predates field-id stamping — " +
          "reads resolve by NAME, so a header-only rename/drop would " +
          "silently null the column; overwrite to re-create it with ids")
    if (needIds)
      require(spark.conf.get("spark.sql.parquet.fieldId.read.enabled",
          "false").equalsIgnoreCase("true"),
        s"$what needs spark.sql.parquet.fieldId.read.enabled=true (set " +
          "by GraftSession) — without id resolution a renamed column " +
          "reads as null")
    require(stored.fieldNames.contains(colName),
      s"$what on $root: no column named $colName " +
        s"(have ${stored.fieldNames.mkString(", ")})")
    Seq("the bounds column" -> m.boundsCol.toSeq,
      "a stats column" -> m.statsCols,
      "a bloom column" -> m.bloomCols,
      "a delete column" -> m.deleteCols).foreach { case (role, cols) =>
      if (cols.contains(colName)) throw new UnsupportedOperationException(
        s"$what on $root: $colName is $role — pruning/delete headers " +
          "attribute by name; retire the role first (optimize / " +
          "overwrite re-stamp), then evolve")
    }
    val token = ("(?i)(?<![A-Za-z0-9_])" +
      java.util.regex.Pattern.quote(colName) + "(?![A-Za-z0-9_])").r
    m.headers.foreach { case (k, v) =>
      if (k.startsWith(ConstraintPrefix) && token.findFirstIn(v).isDefined)
        throw new UnsupportedOperationException(
          s"$what on $root: column $colName is referenced by CHECK " +
            s"constraint ${k.stripPrefix(ConstraintPrefix)} ('$v') — " +
            "drop the constraint, evolve, then re-declare it")
    }
    stored
  }

  /** RENAME AS A HEADER-ONLY COMMIT: the committed schema changes the
    * field's NAME, its field id keeps pointing at the same physical
    * column in every existing file (Iceberg's rename semantics on
    * parquet's field-id mechanism) — zero data IO; files written after
    * the rename carry the new name under the SAME id, so a history
    * mixing both namings reads uniformly at every version. */
  def renameColumn(spark: SparkSession, root: String,
                   from: String, to: String): Int = {
    require(to.nonEmpty && !to.exists(c => c == '\n' || c == '\t'),
      s"renameColumn: invalid target name '$to'")
    val fs = fsOf(spark, new Path(root))
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"no committed version under $root"))
    val m = loadManifest(fs, root, v)
    val stored = requireIdEvolvable(spark, root, m, from, "renameColumn")
    require(from == to ||
      !stored.fieldNames.exists(n => n.equalsIgnoreCase(to) && n != from),
      s"renameColumn on $root: a column named $to already exists")
    val renamed = StructType(stored.fields.map(f =>
      if (f.name == from) f.copy(name = to) else f))
    if (!tryCommit(fs, root, v + 1, m.entryLines,
        m.headers + (SchemaKey -> renamed.json) + (KindKey -> "metadata")))
      throw new java.util.ConcurrentModificationException(
        s"renameColumn on $root lost the commit race; rerun")
    v + 1
  }

  /** DROP AS A PROJECTION MASK: the field leaves the committed schema
    * (header-only, zero data IO) — every read projects it away; its id
    * is RETIRED, never reused (the `#maxfieldid=` high-water mark), so
    * a later re-ADD of the same name gets a fresh id and the dropped
    * column's old values never resurface. Time travel to pre-drop
    * versions still serves the column (each version reads with its own
    * committed schema). */
  def dropColumn(spark: SparkSession, root: String,
                 name: String): Int = {
    val fs = fsOf(spark, new Path(root))
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"no committed version under $root"))
    val m = loadManifest(fs, root, v)
    val stored = requireIdEvolvable(spark, root, m, name, "dropColumn")
    require(stored.fields.length > 1,
      s"dropColumn on $root: cannot drop the last column")
    val masked = StructType(stored.fields.filterNot(_.name == name))
    if (!tryCommit(fs, root, v + 1, m.entryLines,
        m.headers + (SchemaKey -> masked.json) + (KindKey -> "metadata")))
      throw new java.util.ConcurrentModificationException(
        s"dropColumn on $root lost the commit race; rerun")
    v + 1
  }

  /** The sound header-only type changes: parquet's physical encodings
    * let the reader serve a NARROW stored column under a WIDER
    * requested type losslessly (byte/short/int are all INT32 on disk;
    * int64 and double strictly contain them) — Spark 4's vectorized
    * reader upcasts these natively, which [[widenColumn]]'s spec pins
    * empirically. Anything else (narrowing, cross-family, decimal,
    * string) has no lossless header-only story and rejects. */
  private val Widenable: Map[org.apache.spark.sql.types.DataType,
      Set[org.apache.spark.sql.types.DataType]] = {
    import org.apache.spark.sql.types._
    Map(
      ByteType -> Set(ShortType, IntegerType, LongType),
      ShortType -> Set(IntegerType, LongType),
      IntegerType -> Set(LongType),
      FloatType -> Set(DoubleType))
  }

  /** TYPE WIDENING AS A HEADER-ONLY COMMIT (Iceberg/Delta's
    * type-widening shape): the committed schema changes the field's
    * TYPE to a strictly wider one — same name, same field id, zero
    * data IO. Old files keep the narrow physical column and every
    * read upcasts it losslessly (the requested-schema read path);
    * files written after the widening carry the wide type under the
    * SAME id, so a mixed-width history reads uniformly at every
    * version, and time travel to pre-widening versions serves the
    * narrow type (each version reads with its own committed schema).
    * Shares [[requireIdEvolvable]]'s role/constraint gate with
    * rename/drop — pruning-role (bounds/stats/bloom/delete) and
    * constraint-referenced columns reject (bloom sidecars hash the
    * PHYSICAL values), so retire the role (optimize / re-stamp) before
    * widening — but does NOT require field ids: the name never
    * changes, so by-name resolution of the narrow physical column
    * under the wide requested type stays sound on legacy tables too
    * (spec-pinned). Appends after the widening
    * must send the WIDE type (the schema contract is exact — SQL
    * INSERT casts automatically; Scala callers cast explicitly). */
  def widenColumn(spark: SparkSession, root: String, name: String,
                  to: org.apache.spark.sql.types.DataType): Int = {
    val fs = fsOf(spark, new Path(root))
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"no committed version under $root"))
    val m = loadManifest(fs, root, v)
    val stored = requireIdEvolvable(spark, root, m, name, "widenColumn",
      needIds = false)
    val from = stored(name).dataType
    if (from == to) return v // idempotent no-op, no empty commit
    if (!Widenable.get(from).exists(_.contains(to)))
      throw new UnsupportedOperationException(
        s"widenColumn on $root: $name: ${from.simpleString} -> " +
          s"${to.simpleString} is not a lossless widening (supported: " +
          "byte/short/int up the integral chain to bigint, float -> " +
          "double) — narrowing or cross-family retyping needs a " +
          "rewrite: CREATE a new table from a cast SELECT")
    val widened = StructType(stored.fields.map(f =>
      if (f.name == name) f.copy(dataType = to) else f))
    if (!tryCommit(fs, root, v + 1, m.entryLines,
        m.headers + (SchemaKey -> widened.json) + (KindKey -> "metadata")))
      throw new java.util.ConcurrentModificationException(
        s"widenColumn on $root lost the commit race; rerun")
    v + 1
  }

  // -------------------------------------------------------------------
  // WRITABLE BRANCHES — write-audit-publish (see [[BranchPrefix]])
  // -------------------------------------------------------------------

  private def requireBranchName(name: String): Unit =
    require(name.nonEmpty && !name.forall(_.isDigit) &&
      name.forall(c => c.isLetterOrDigit || c == '_'),
      s"branch name must be [A-Za-z0-9_]+ with a non-digit, got '$name'")

  private def branchManifestPath(root: String, name: String, v: Int) =
    new Path(manifestDir(root), f"branch-$name-v$v%08d.manifest")

  private val BranchManifestName =
    """branch-([A-Za-z0-9_]+)-v(\d{8})\.manifest""".r

  private def branchVersions(fs: FileSystem, root: String,
                             name: String): Seq[Int] =
    fs.listStatus(manifestDir(root)).toSeq.map(_.getPath.getName)
      .collect { case BranchManifestName(n, d) if n == name => d.toInt }
      .sorted

  /** The base version branch `name` forked at; None = no such branch. */
  def branchBase(spark: SparkSession, root: String,
                 name: String): Option[Int] = {
    val fs = fsOf(spark, new Path(root))
    currentVersion(spark, root)
      .flatMap(v => loadManifest(fs, root, v).headers
        .get(BranchPrefix + name)).flatMap(_.toIntOption)
  }

  /** The branch head: its newest own commit, or (for a just-created
    * branch) the base version's manifest. */
  private def branchHeadOf(spark: SparkSession, fs: FileSystem,
                           root: String, name: String)
      : (Int, ManifestData) = {
    val base = branchBase(spark, root, name).getOrElse(
      throw new IllegalArgumentException(
        s"no branch named $name on $root"))
    branchVersions(fs, root, name).filter(_ > base).lastOption
      .map(v => v -> loadManifestAt(fs,
        branchManifestPath(root, name, v)))
      .getOrElse {
        require(versions(spark, root).contains(base),
          s"branch $name's base version $base of $root is gone")
        base -> loadManifest(fs, root, base)
      }
  }

  /** Fork a branch at the current (or a retained) version — one
    * header-only main commit declaring the pointer. */
  def createBranch(spark: SparkSession, root: String, name: String,
                   atVersion: Option[Int] = None): Int = {
    requireBranchName(name)
    val fs = fsOf(spark, new Path(root))
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"no committed version under $root"))
    val m = loadManifest(fs, root, v)
    require(!m.headers.contains(BranchPrefix + name),
      s"branch $name already exists on $root")
    require(!m.headers.contains(TagPrefix + name),
      s"cannot create branch $name on $root: a TAG of that name " +
        "exists — 'VERSION AS OF' resolution must stay unambiguous")
    // stale manifests from a previously dropped/published same-named
    // branch (best-effort cleanup can fail on a flaky store) would be
    // picked up as the NEW branch's head — clean them, and refuse to
    // fork until none survive
    branchVersions(fs, root, name).foreach(bv =>
      scala.util.Try(fs.delete(branchManifestPath(root, name, bv), false)))
    require(branchVersions(fs, root, name).isEmpty,
      s"stale branch-$name manifests survive under $root and could " +
        "not be deleted — remove them (vacuum) before re-creating " +
        "the branch")
    val target = atVersion.getOrElse(v)
    require(versions(spark, root).contains(target),
      s"cannot branch $root at $target — not a retained version")
    if (!tryCommit(fs, root, v + 1, m.entryLines,
        m.headers + ((BranchPrefix + name) -> target.toString) +
          (KindKey -> "metadata")))
      throw new java.util.ConcurrentModificationException(
        s"createBranch on $root lost the commit race; rerun")
    v + 1
  }

  /** Abandon a branch: remove the pointer (header-only commit), then
    * best-effort delete its manifests (vacuum sweeps aged stragglers —
    * their files stop being referenced the moment the pointer dies). */
  def dropBranch(spark: SparkSession, root: String, name: String): Int = {
    val fs = fsOf(spark, new Path(root))
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"no committed version under $root"))
    val m = loadManifest(fs, root, v)
    require(m.headers.contains(BranchPrefix + name),
      s"no branch named $name on $root")
    if (!tryCommit(fs, root, v + 1, m.entryLines,
        m.headers - (BranchPrefix + name) + (KindKey -> "metadata")))
      throw new java.util.ConcurrentModificationException(
        s"dropBranch on $root lost the commit race; rerun")
    branchVersions(fs, root, name).foreach(bv =>
      scala.util.Try(fs.delete(branchManifestPath(root, name, bv), false)))
    v + 1
  }

  /** The branch head as a DataFrame — the AUDIT read (`VERSION AS OF
    * '<branch>'` through the SQL catalog resolves here too). */
  def readBranch(spark: SparkSession, root: String,
                 name: String): DataFrame = {
    val fs = fsOf(spark, new Path(root))
    val (v, m) = branchHeadOf(spark, fs, root, name)
    Snapshot(v, m.dataEntries.map(e => new Path(root, e.rel).toString),
      m.schema,
      m.deleteEntries.map(e => new Path(root, e.rel).toString),
      m.deleteCols).read(spark)
  }

  /** Append to a BRANCH: stages data files in the shared `data/` dir
    * (publish carries lines, never copies bytes) and commits a branch
    * manifest. Exact-schema appends only — branch-side evolution would
    * force publish to reconcile schemas against a moved main, so it
    * rejects loudly (evolve on main, re-branch). The resurrection
    * guard and CHECK constraints hold exactly as on main. */
  def appendToBranch(spark: SparkSession, root: String, name: String,
                     df: DataFrame): Int = {
    val fs = fsOf(spark, new Path(root))
    val (headV, m) = branchHeadOf(spark, fs, root, name)
    m.schema.foreach { stored =>
      require(stored.fieldNames.toSeq == df.schema.fieldNames.toSeq &&
        stored.fields.map(_.dataType).toSeq ==
          df.schema.fields.map(_.dataType).toSeq,
        s"append to branch $name of $root must match the table " +
          s"schema exactly (${stored.fieldNames.mkString(", ")}) — " +
          "branch-side evolution is not supported; evolve on main " +
          "and re-branch")
    }
    if (m.deleteEntries.nonEmpty && m.deleteCols.nonEmpty) {
      val ks = m.deleteCols
      val delKeys = spark.read.parquet(m.deleteEntries.map(e =>
          new Path(root, e.rel).toString): _*)
        .select(ks.map(col): _*).distinct()
      require(df.join(delKeys, ks, "left_semi").take(1).isEmpty,
        s"append to branch $name of $root would resurrect " +
          s"equality-deleted (${ks.mkString(", ")}) tuples")
    }
    validateConstraints(df, m.headers.collect {
      case (hk, hv) if hk.startsWith(ConstraintPrefix) =>
        hk.stripPrefix(ConstraintPrefix) -> hv
    }.toMap, s"append to branch $name of $root")
    val effBounds = m.boundsCol.filter(b =>
      df.schema.fieldNames.contains(b) &&
        isIntegral(df.schema(b).dataType))
    val effBloom = m.bloomCols.filter(k =>
      df.schema.fieldNames.contains(k) &&
        scala.util.Try(statExpr(df.schema, k)).isSuccess)
    val dfOut = m.schema.map(alignToSchema(df, _)).getOrElse(df)
    val staged = stage(spark, root, dir => dfOut.write.parquet(dir),
      boundsCol = effBounds, bloomCols = effBloom)
    // branch manifests never carry branch pointers (pointers live on
    // the MAIN chain only — a published branch must not smuggle them)
    val headers = m.headers.filterNot(_._1.startsWith(BranchPrefix)) +
      (KindKey -> "append")
    if (!tryCommitPath(fs, root,
        branchManifestPath(root, name, headV + 1),
        m.entryLines ++ staged, headers))
      throw new java.util.ConcurrentModificationException(
        s"append to branch $name of $root lost the commit race; rerun")
    headV + 1
  }

  /** PUBLISH (the write-audit-publish promotion): the branch's net
    * file-level change — lines it removed from its base, lines it
    * added — lands on the CURRENT main head as ONE commit, so main
    * appends that raced the branch's life are CARRIED, never lost
    * (file-granularity rebase; a main append's rows survive even if
    * they hold keys the branch merged — audit-then-publish workflows
    * gate ingest elsewhere, stated honestly). Sound exactly when main
    * only ADDED manifest lines since the base (appends, metadata,
    * delete commits) — proven directly from the base and main
    * manifests, so vacuumed intermediates never block: any rewrite
    * that moved a base file, a schema change, or a constraint change
    * rejects loudly — rebase by re-branching. The branch pointer dies
    * with the publish commit. */
  def publishBranch(spark: SparkSession, root: String,
                    name: String): Int = {
    val fs = fsOf(spark, new Path(root))
    val base = branchBase(spark, root, name).getOrElse(
      throw new IllegalArgumentException(
        s"no branch named $name on $root"))
    val mainV = currentVersion(spark, root).get
    val mBase = loadManifest(fs, root, base)
    val mMain = loadManifest(fs, root, mainV)
    // SOUNDNESS PROOF, from base + main alone (vacuumed intermediate
    // manifests never block an otherwise-sound publish): main may only
    // have ADDED lines since the base — appends, metadata commits, and
    // delete commits add lines and never remove one, while ANY rewrite
    // that touched a base file removed its line and conflicts with the
    // branch's diff against that same base.
    val mainLines = mMain.entryLines.toSet
    val movedAway = mBase.entryLines.filterNot(mainLines.contains)
    require(movedAway.isEmpty,
      s"publish of branch $name on $root: main rewrote or removed " +
        s"${movedAway.size} of the branch base's file(s) since the " +
        "fork (a compact/merge/rowdelete/restore moved the base out " +
        "from under the staged diff) — re-branch from the new head " +
        "and re-apply")
    val (headV, mHead) = branchHeadOf(spark, fs, root, name)
    require(headV > base,
      s"branch $name of $root has no commits to publish")
    require(mMain.headers.get(SchemaKey) == mBase.headers.get(SchemaKey),
      s"publish of branch $name on $root: the main schema changed " +
        "since the base — re-branch and re-apply")
    def constraintsOf(h: Map[String, String]) =
      h.filter(_._1.startsWith(ConstraintPrefix))
    require(constraintsOf(mMain.headers) == constraintsOf(mBase.headers),
      s"publish of branch $name on $root: constraints changed since " +
        "the base — the branch's rows were never validated against " +
        "them; re-branch and re-apply")
    require(mMain.headers.get(DeleteKey) == mBase.headers.get(DeleteKey),
      s"publish of branch $name on $root: the main delete declaration " +
        "changed since the base; re-branch")
    // bounds/stats headers attribute the manifest lines' [lo, hi]
    // slots BY NAME: a branch merge keyed on a different column
    // re-resolved its lines for THAT key and rewrote the branch's
    // bounds header — splicing those lines under main's header would
    // misattribute every value (silently wrong pruning forever after)
    require(mHead.headers.get(BoundsKey) == mBase.headers.get(BoundsKey)
        && mHead.headers.get(StatsKey) == mBase.headers.get(StatsKey),
      s"publish of branch $name on $root: the branch re-keyed the " +
        "bounds/stats headers (a merge keyed off the table's bounds " +
        "column) — its lines cannot splice under main's header; " +
        "re-cluster on main after a bounds-compatible re-branch")
    val baseLines = mBase.entryLines.toSet
    val headLines = mHead.entryLines.toSet
    // the branch's net diff against its base; base ⊆ main was proven
    // above, so every branch-removed line is guaranteed still on main
    val removed = baseLines -- headLines
    val added = mHead.entryLines.filterNot(baseLines.contains)
    val outLines = mMain.entryLines.filterNot(removed.contains) ++ added
    // the published delete DECLARATION must match the published delete
    // LINES: the branch may have consolidated or cleared ITS deletes,
    // but main may have added delete files since the fork (same
    // column-set — the equality check above) whose lines survive in
    // outLines; dropping the header then would brick every read
    // (applyDeletes fails loudly on undeclared delete files). Keep the
    // header iff any delete line remains, from whichever side declares
    // it.
    val outHasDeletes = outLines.exists(l =>
      parseEntry(l).isDelete)
    val deleteHdr: Map[String, String] =
      if (!outHasDeletes) Map.empty
      else Map(DeleteKey -> mMain.headers.get(DeleteKey)
        .orElse(mHead.headers.get(DeleteKey))
        .getOrElse(throw new IllegalStateException(
          s"publish of branch $name on $root: delete files in the " +
            "published manifest but neither side declares #deletecol")))
    val cleaned = (mMain.headers - (BranchPrefix + name) - DeleteKey) ++
      deleteHdr + (KindKey -> "publish")
    if (!tryCommit(fs, root, mainV + 1, outLines, cleaned))
      throw new java.util.ConcurrentModificationException(
        s"publish of branch $name on $root lost the commit race; rerun")
    branchVersions(fs, root, name).foreach(bv =>
      scala.util.Try(fs.delete(branchManifestPath(root, name, bv), false)))
    mainV + 1
  }

  /** One committed version's summary: when it landed (its MONOTONIZED
    * commit instant — see [[history]]), what it lists, and its metadata
    * row count when stats allow. */
  case class CommitInfo(version: Int, timestampMs: Long,
                        dataFiles: Int, deleteFiles: Int,
                        rows: Option[Long],
                        kind: Option[String] = None)

  /** DESCRIBE HISTORY: every retained version, oldest first. O(versions)
    * manifest reads, zero data IO. Commit instants start from the
    * manifest files' mtimes (the atomic rename IS the commit) but are
    * MONOTONIZED Delta-style — effective instant =
    * `max(previous instant + 1, mtime)` — because raw mtimes can
    * collide (coarse-mtime filesystems, or two metadata-only commits
    * inside one tick) or invert (clock skew, relocated tables), and a
    * shared or inverted instant would make [[readAtTimestamp]] at the
    * earlier commit's own instant resolve to the later version. With
    * strictly increasing instants, every version has a timestamp that
    * resolves to exactly itself. */
  def history(spark: SparkSession, root: String): Seq[CommitInfo] = {
    val fs = fsOf(spark, new Path(root))
    var prevTs = Long.MinValue
    versions(spark, root).map { v =>
      val m = loadManifest(fs, root, v)
      val mtime = fs.getFileStatus(manifestPath(root, v))
        .getModificationTime
      val eff = if (prevTs == Long.MinValue) mtime
                else math.max(prevTs + 1, mtime)
      prevTs = eff
      val des = m.entries.count(_.isDelete)
      // row count from the SAME parse ([[rowCountFromStats]]' rule:
      // None under outstanding deletes or pre-v3 lines)
      val rows =
        if (des > 0 || m.entries.isEmpty ||
            m.entries.exists(_.rows.isEmpty)) None
        else Some(m.entries.map(_.rows.get).sum)
      CommitInfo(v, eff, m.entries.size - des, des, rows,
        m.headers.get(KindKey))
    }
  }

  /** TIME TRAVEL BY TIMESTAMP (Delta's `timestampAsOf`): the newest
    * version committed at or before `tsMs` — resolved from the
    * MONOTONIZED commit instants [[history]] computes, so each
    * version's own instant resolves to exactly that version even when
    * raw mtimes collide or invert. Fails loudly for a timestamp before
    * the first retained commit (the data may be vacuumed; silently
    * serving a LATER version would be wrong). */
  def readAtTimestamp(spark: SparkSession, root: String,
                      tsMs: Long): DataFrame =
    readAt(spark, root, versionAtTimestamp(spark, root, tsMs))

  /** The version `tsMs` resolves to — shared by [[readAtTimestamp]]
    * and the SQL catalog's `TIMESTAMP AS OF` (one resolution rule,
    * two surfaces). */
  def versionAtTimestamp(spark: SparkSession, root: String,
                         tsMs: Long): Int = {
    val h = history(spark, root)
    require(h.nonEmpty, s"no committed version under $root")
    h.filter(_.timestampMs <= tsMs).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"$tsMs predates the earliest retained commit of $root " +
          s"(${h.map(_.timestampMs).min}); earlier versions are " +
          "vacuumed")).version
  }

  /** The table's named tags, name → version (see [[TagPrefix]]). */
  def tags(spark: SparkSession, root: String): Map[String, Int] = {
    val fs = fsOf(spark, new Path(root))
    currentVersion(spark, root)
      .map(v => loadManifest(fs, root, v).headers.collect {
        case (k, hv) if k.startsWith(TagPrefix) &&
            hv.toIntOption.isDefined =>
          k.stripPrefix(TagPrefix) -> hv.toInt
      }.toMap).getOrElse(Map.empty)
  }

  /** The table's live branches as declared on the CURRENT version:
    * (name, base version, staged branch commits) — O(headers) + one
    * manifest-dir listing, zero data IO (the `db.t.branches` metadata
    * table's source; a restore may roll a pointer off the head, which
    * correctly drops the branch from this listing until restored
    * back). */
  def branches(spark: SparkSession,
               root: String): Seq[(String, Int, Int)] = {
    val fs = fsOf(spark, new Path(root))
    currentVersion(spark, root).toSeq.flatMap { v =>
      loadManifest(fs, root, v).headers.collect {
        case (k, b) if k.startsWith(BranchPrefix) &&
            b.toIntOption.isDefined =>
          val name = k.stripPrefix(BranchPrefix)
          (name, b.toInt, branchVersions(fs, root, name).size)
      }.toSeq.sortBy(_._1)
    }
  }

  /** Tag `version` as `name` — a header-only commit (entry lines
    * verbatim, zero data IO). The tagged version becomes a vacuum
    * retention floor until [[removeTag]]. Re-tagging an existing name
    * moves it (the newest declaration wins). */
  def addTag(spark: SparkSession, root: String, name: String,
             version: Int): Int = {
    requireTxnId(name) // same identifier alphabet as writer markers
    // a digit-only tag would be silently shadowed by the integer
    // version of the same spelling in the SQL catalog's VERSION AS OF
    // resolution (an integer literal wins) — reject at declaration
    // rather than resolve ambiguously at read time
    require(!name.forall(_.isDigit),
      s"tag name '$name' is all digits — VERSION AS OF would resolve " +
        "it as a version number, never the tag; pick a non-numeric name")
    val fs = fsOf(spark, new Path(root))
    val vs = versions(spark, root)
    require(vs.contains(version),
      s"cannot tag version $version of $root " +
        s"(have ${vs.mkString(",")}) — vacuumed or never committed")
    val m = loadManifest(fs, root, vs.last)
    if (!tryCommit(fs, root, vs.last + 1, m.entryLines,
        m.headers + ((TagPrefix + name) -> version.toString) +
          (KindKey -> "metadata")))
      throw new java.util.ConcurrentModificationException(
        s"addTag on $root lost the commit race; rerun")
    vs.last + 1
  }

  /** Drop tag `name` — header-only commit; the tagged version becomes
    * vacuum-collectable again. */
  def removeTag(spark: SparkSession, root: String, name: String): Int = {
    val fs = fsOf(spark, new Path(root))
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed version under $root"))
    val m = loadManifest(fs, root, v)
    require(m.headers.contains(TagPrefix + name),
      s"no tag named $name on $root")
    if (!tryCommit(fs, root, v + 1, m.entryLines,
        m.headers - (TagPrefix + name) + (KindKey -> "metadata")))
      throw new java.util.ConcurrentModificationException(
        s"removeTag on $root lost the commit race; rerun")
    v + 1
  }

  /** The table exactly as of the version tag `name` pins. */
  def readAtTag(spark: SparkSession, root: String,
                name: String): DataFrame = {
    val t = tags(spark, root)
    require(t.contains(name),
      s"no tag named $name on $root " +
        s"(have ${t.keys.toSeq.sorted.mkString(", ")})")
    readAt(spark, root, t(name))
  }

  /** The newest committed version marker of writer `appId` (see
    * [[TxnPrefix]]); None = this application never committed here. */
  def lastTxnVersion(spark: SparkSession, root: String,
                     appId: String): Option[Long] = {
    val fs = fsOf(spark, new Path(root))
    currentVersion(spark, root)
      .flatMap(v => loadManifest(fs, root, v)
        .headers.get(TxnPrefix + appId))
      .flatMap(_.toLongOption)
  }

  private def requireTxnId(appId: String): Unit =
    require(appId.nonEmpty && appId.forall(c =>
      c.isLetterOrDigit || c == '_' || c == '-' || c == '.'),
      s"txn appId must be [A-Za-z0-9_.-]+, got '$appId'")

  def mergeCoW(spark: SparkSession, root: String, keyCol: String,
               removeKeys: DataFrame, upserts: DataFrame,
               txn: Option[(String, Long)] = None): (Int, Int, Int) =
    mergeCoWKeys(spark, root, Seq(keyCol), removeKeys, upserts, txn)

  /** The TUPLE-KEYED merge (the [[mergeCoW]] contract with a composite
    * key): rows are removed/replaced when their WHOLE `keyCols` tuple
    * matches — the merge twin of [[deleteWhereKeysIn]]'s composite
    * equality deletes, and the resurrection path for composite-delete
    * tables (delete sequencing reconciles tuple-for-tuple when
    * `keyCols` equals the table's delete column-set exactly). File
    * pruning uses the FIRST key column's stored bounds (file stats are
    * per-column [lo, hi]; stabbing on the leading column is a sound
    * superset — a file holding a changed tuple always contains its
    * leading value), so cluster composite-keyed tables on
    * `keyCols.head`; a table that ISN'T (heavily-overlapping per-file
    * leading-key ranges while pruning keeps >90% of files) raises a
    * named diagnostic through `onDiagnostic` (default: the library
    * logger) recommending exactly that. `removeKeys` is a
    * keyCols-relation; `upserts` carries full rows. */
  /** Where [[mergeCoWKeys]]' pruning-degradation diagnostic goes when
    * the caller doesn't inject a sink: the library's logger — visible
    * in executor/driver logs without any wiring. */
  private def logDiagnostic(msg: String): Unit =
    org.slf4j.LoggerFactory.getLogger("graft.ManifestTable").warn(msg)

  def mergeCoWKeys(spark: SparkSession, root: String,
                   keyCols: Seq[String],
                   removeKeys: DataFrame, upserts: DataFrame,
                   txn: Option[(String, Long)] = None,
                   onDiagnostic: String => Unit = logDiagnostic,
                   branch: Option[String] = None)
      : (Int, Int, Int) = {
    import spark.implicits._
    require(keyCols.nonEmpty && keyCols.distinct == keyCols,
      s"mergeCoW needs distinct key columns, got ${keyCols.mkString(", ")}")
    require(branch.isEmpty || txn.isEmpty,
      "txn markers are a main-chain cursor; a staged branch merge " +
        "takes its marker at publish time")
    val fs = fsOf(spark, new Path(root))
    // on a BRANCH the merge reads and commits against the branch head
    // (write-audit-publish: invisible to main until publishBranch)
    val (baseVersion, m) = branch match {
      case Some(b) => branchHeadOf(spark, fs, root, b)
      case None =>
        val v = currentVersion(spark, root)
          .getOrElse(throw new IllegalArgumentException(
            s"no committed version under $root"))
        v -> loadManifest(fs, root, v)
    }
    // DELETE SEQUENCING (the Iceberg per-snapshot-sequencing shape): a
    // merge over outstanding merge-on-read deletes is sound exactly
    // when the delete column-SET is the merge key-set — then (a)
    // rewritten files read THROUGH the delete set (suppressed rows
    // drop physically), (b) carried files keep their suppressed rows
    // but the delete set carries forward to keep suppressing them, and
    // (c) every CHANGED tuple leaves the delete set (an upsert
    // resurrects-and-replaces; a remove makes its delete moot),
    // consolidated into one fresh delta-sized delete file. A merge
    // keyed on a DIFFERENT column-set cannot reconcile the two key
    // spaces and is still rejected.
    require(m.deleteEntries.isEmpty || m.deleteCols == keyCols,
      s"$root carries outstanding equality deletes on " +
        s"(${m.deleteCols.mkString(", ")}); a copy-on-write merge " +
        s"keyed on (${keyCols.mkString(", ")}) cannot sequence them — " +
        "merge on exactly the delete column-set, or run optimize first")
    // honor stored bounds ONLY if the manifest declares them for the
    // LEADING key column (as the primary bounds column or an extra
    // stats column) — bounds of a different column would prune wrong
    // files
    val entries = m.entriesFor(keyCols.head)
    require(entries.nonEmpty,
      s"version $baseVersion of $root lists no data files; " +
        "use overwrite to (re)populate an emptied table")
    val tableSchema = m.schema
    val changedKeys = removeKeys.select(keyCols.map(col): _*)
      .unionByName(upserts.select(keyCols.map(col): _*)).distinct()
      .localCheckpoint() // read thrice: two probes + rewrite anti-join
    // null keys cannot be merged: the anti-join would never match them
    // (SQL null semantics), silently appending duplicates — fail fast.
    // The probe is FOLDED into the interval-stab job below when the
    // table has bounded entries (one pass over the checkpointed keys
    // answers both; a dedicated job otherwise) — every merge commit in
    // the engine pays this path, so one job here is one job per
    // commit, suite-wide.
    def nullKeyError(): Nothing = throw new IllegalArgumentException(
      s"mergeCoW: null (${keyCols.mkString(", ")}) in removeKeys/" +
        "upserts is unsupported (an upsert of a null key could never " +
        "replace its row)")
    // (1) bounded entries: interval stabbing of each changed key
    // against the broadcast [lo, hi] file bounds — delta-sized work,
    // zero data-file IO. Files sorted by lo; ranges may overlap
    // (appends), so the backward walk stops on the PREFIX-MAX of hi.
    val (bounded, unbounded) =
      entries.partition(e => e.lo.isDefined && e.hi.isDefined)
    val boundedAffected: Set[String] = if (bounded.isEmpty) {
      if (changedKeys.where(keyCols.map(col(_).isNull).reduce(_ || _))
          .take(1).nonEmpty) nullKeyError()
      Set.empty
    } else {
      val sorted = bounded.sortBy(_.lo.get)
      val bcLo = spark.sparkContext.broadcast(sorted.map(_.lo.get).toArray)
      val bcHi = spark.sparkContext.broadcast(sorted.map(_.hi.get).toArray)
      val bcPm = spark.sparkContext.broadcast(
        sorted.map(_.hi.get).scanLeft(Long.MinValue)(math.max).drop(1).toArray)
      val bcRel = spark.sparkContext.broadcast(sorted.map(_.rel).toArray)
      // "\t" can never be a staged rel (UUID alphabet) — safe sentinel
      // for "a null key was seen in this partition"
      val nullMark = "\t"
      val stabbed = changedKeys.select(
          keyCols.map(col(_).isNull).reduce(_ || _).as("_n"),
          col(keyCols.head).cast("long").as("_k"))
        .distinct()
        .mapPartitions { it =>
          val lo = bcLo.value; val hi = bcHi.value
          val pm = bcPm.value; val rel = bcRel.value
          it.flatMap { row =>
            if (row.getBoolean(0)) Iterator.single(nullMark)
            else {
              val k = row.getLong(1)
              // last file with lo <= k, then walk back while any
              // earlier file can still reach k (prefix-max hi >= k)
              var a = 0; var b = lo.length - 1; var idx = -1
              if (lo(0) <= k) {
                while (a < b) {
                  val mid = (a + b + 1) >>> 1
                  if (lo(mid) <= k) a = mid else b = mid - 1
                }
                idx = a
              }
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = idx
              while (i >= 0 && pm(i) >= k) {
                if (hi(i) >= k) out += rel(i)
                i -= 1
              }
              out
            }
          }
        }.distinct().collect().toSet
      if (stabbed.contains(nullMark)) nullKeyError()
      stabbed - nullMark
    }
    // (2) unbounded entries: key-column-only scan of just those files
    val unboundedAffected: Set[String] = if (unbounded.isEmpty) Set.empty
    else {
      val qToRel = unbounded.map(e =>
        fs.makeQualified(new Path(root, e.rel)).toString -> e.rel).toMap
      readFiles(spark, unbounded.map(e =>
          new Path(root, e.rel).toString), tableSchema)
        .select(keyCols.map(col): _*)
        .withColumn("_f", input_file_name())
        .join(changedKeys, keyCols, "left_semi")
        .select("_f").distinct()
        .collect().flatMap(r =>
          qToRel.get(fs.makeQualified(new Path(r.getString(0))).toString))
        .toSet
    }
    val affectedRels = boundedAffected ++ unboundedAffected
    // PRUNING-DEGRADATION DIAGNOSTIC: keeping >90% of a multi-file
    // table's bounded entries is only a MISCONFIGURATION when the
    // per-file leading-key ranges overlap heavily (each file spans
    // most of the domain — the table is clustered on something other
    // than keyCols.head, so the interval stab can't prune). A
    // correctly-clustered table whose changed keys genuinely span the
    // domain (q191's shape: near-disjoint file ranges, all rewritten)
    // stays silent — that rewrite is the work requested, not a layout
    // problem.
    if (bounded.size >= 4 &&
        boundedAffected.size * 10 > bounded.size * 9) {
      val domLo = bounded.map(_.lo.get).min
      val domHi = bounded.map(_.hi.get).max
      val domain = math.max(domHi - domLo + 1, 1L)
      val avgSpan = bounded.map(e => e.hi.get - e.lo.get + 1).sum
        .toDouble / bounded.size
      if (avgSpan * 2 > domain.toDouble)
        onDiagnostic(
          s"mergeCoWKeys on $root: bounded pruning kept " +
            s"${boundedAffected.size} of ${bounded.size} files and the " +
            s"per-file ${keyCols.head} ranges overlap heavily (avg " +
            f"span ${100 * avgSpan / domain}%.0f%% of the domain) — " +
            s"the table is not clustered on the leading merge key; " +
            s"cluster on ${keyCols.head} (optimize / repartitionByRange" +
            s" + overwrite) to restore file pruning")
    }
    val rewriteE = entries.filter(e => affectedRels.contains(e.rel))
    // carried lines: VERBATIM when the merge key is the table's primary
    // bounds column (extra stats pairs stay attributed under the kept
    // headers); under a different key the primary slots are re-resolved
    // for keyCol (the new header) and any extra pairs go dormant (a
    // pair without its header line is never consulted — safe, unpruned)
    val headerMatches = m.boundsCol.contains(keyCols.head)
    val carryE = (if (headerMatches) m.dataEntries else entries)
      .filterNot(e => affectedRels.contains(e.rel))
    // delete sequencing: the outstanding delete keys (delta-sized),
    // read once, used thrice (rewrite filter, overlap probe,
    // consolidation)
    val delKeys: Option[DataFrame] =
      if (m.deleteEntries.isEmpty) None
      else Some(spark.read.parquet(m.deleteEntries.map(e =>
          new Path(root, e.rel).toString): _*)
        .select(keyCols.map(col): _*).distinct().localCheckpoint())
    // align the upserts to the table's column order — and REJECT an
    // upsert that carries columns the table lacks: silently dropping
    // them would lose data (widen the schema via append/overwrite first)
    val tableCols = tableSchema.map(_.fieldNames.toSeq).getOrElse(
      spark.read.parquet(new Path(root, entries.head.rel).toString)
        .columns.toSeq)
    val extraCols = upserts.columns.filterNot(tableCols.contains)
    require(extraCols.isEmpty,
      s"mergeCoW upserts carry columns the table lacks: " +
        s"${extraCols.mkString(", ")} — merge never drops data silently; " +
        "widen the table schema first (append supports add-column " +
        "evolution) or drop the columns explicitly")
    val up = upserts.select(tableCols.map(col): _*)
    // CHECK constraints gate the upserts BEFORE any rewrite is staged
    // (from the already-loaded base manifest — no re-parse)
    validateConstraints(up, m.headers.collect {
      case (hk, hv) if hk.startsWith(ConstraintPrefix) =>
        hk.stripPrefix(ConstraintPrefix) -> hv
    }.toMap, s"mergeCoW upserts into $root")
    // surviving rows of the affected files (neither suppressed by an
    // outstanding delete, nor removed, nor about to be replaced by an
    // upsert of the same key) + the upsert rows
    val rewritten =
      if (rewriteE.nonEmpty) {
        val affectedRows = readFiles(spark, rewriteE.map(e =>
            new Path(root, e.rel).toString), tableSchema)
        delKeys.map(dk => affectedRows.join(dk, keyCols, "left_anti"))
          .getOrElse(affectedRows)
          .join(changedKeys, keyCols, "left_anti")
          .unionByName(up)
      } else up
    // a pure delete can stage zero rows — the new manifest is then the
    // carried files alone. The rewrite is bounds-stamped (for integral
    // keys — others degrade to stats-only lines), so the next merge on
    // this table prunes from the manifest alone.
    val stampCol = Some(keyCols.head)
      .filter(c => isIntegral(up.schema(c).dataType))
    // bloom sidecars are attributed by COLUMN NAME in their commit dir
    // (not by line position), so carried files keep theirs no matter
    // what happens to the bounds header; the rewrite stamps fresh ones
    val bloomCs = m.bloomCols.filter(k =>
      rewritten.schema.fieldNames.contains(k) &&
        scala.util.Try(statExpr(rewritten.schema, k)).isSuccess)
    // staged files must carry the committed schema's field ids —
    // upsert frames come from user DataFrames with no id metadata
    val rewrittenOut = tableSchema.map(alignToSchema(rewritten, _))
      .getOrElse(rewritten)
    val staged = stage(spark, root,
      dir => rewrittenOut.write.parquet(dir), allowEmpty = true,
      boundsCol = stampCol, bloomCols = bloomCs)
    // delete sequencing, write side: changed keys leave the delete set
    // — carry the delete files VERBATIM when the merge touched none of
    // their keys (zero IO), else consolidate the surviving keys into
    // one fresh delta-sized delete file (the old files stay on disk
    // for time travel until vacuumed)
    val deleteLines: Seq[String] = delKeys match {
      case None => Seq.empty
      case Some(dk) =>
        // ONE probe job for both decisions (touched? anything left?):
        // changedKeys is distinct, so the outer join is row-preserving
        // and count(__m) counts exactly the touched delete keys
        val probe = dk.join(
            changedKeys.withColumn("__m", lit(1)), keyCols, "left_outer")
          .agg(count(lit(1)).as("_n"), count(col("__m")).as("_touched"))
          .collect()(0)
        val total = probe.getLong(0); val touched = probe.getLong(1)
        if (touched == 0) m.deleteEntries.map(_.line)
        else if (total == touched) Seq.empty
        else stage(spark, root,
          dir => dk.join(changedKeys, keyCols, "left_anti")
            .coalesce(1).write.parquet(dir),
          relPrefix = "deletes")
    }
    // a merge that would empty the table entirely (full-table delete
    // whose rewrite staged zero files) must not brick it with a
    // zero-entry manifest — truncation is overwrite's job
    require(carryE.nonEmpty || staged.nonEmpty,
      s"merge would leave $root with no data files; " +
        "use overwrite to truncate a table")
    val outLines = carryE.map(_.line) ++ staged ++ deleteLines
    val headers = boundsHeader(stampCol) ++
      // extra stats survive a merge only under their declaring header —
      // and only when the primary key kept its meaning (see carryE)
      (if (headerMatches) m.headers.get(StatsKey).map(StatsKey -> _).toMap
       else Map.empty[String, String]) ++
      // the delete declaration survives exactly as long as delete
      // files remain outstanding
      (if (deleteLines.nonEmpty)
         m.headers.get(DeleteKey).map(DeleteKey -> _).toMap
       else Map.empty[String, String]) ++
      // the bloom declaration ALWAYS survives (name-attributed sidecars)
      m.headers.get(BloomKey).map(BloomKey -> _).toMap ++
      // writer markers + constraints survive every merge; this commit
      // may set its own marker
      carriedHeaders(m.headers) ++
      txn.map { case (app, ver) =>
        requireTxnId(app); (TxnPrefix + app) -> ver.toString }.toMap ++
      tableSchema.map(SchemaKey -> _.json).toMap + (KindKey -> "merge")
    // branch manifests never carry branch pointers (main-chain only)
    val outHeaders = branch.map(_ =>
      headers.filterNot(_._1.startsWith(BranchPrefix))).getOrElse(headers)
    val committed = branch match {
      case Some(b) => tryCommitPath(fs, root,
        branchManifestPath(root, b, baseVersion + 1), outLines, outHeaders)
      case None => tryCommit(fs, root, baseVersion + 1, outLines,
        outHeaders)
    }
    if (!committed)
      throw new java.util.ConcurrentModificationException(
        s"merge into $root${branch.map(b => s" (branch $b)")
          .getOrElse("")} lost the commit race for version " +
          s"${baseVersion + 1}; rerun against the new base")
    (baseVersion + 1, carryE.size, staged.size)
  }

  /** ROW-LEVEL COPY-ON-WRITE DELETE (`DELETE FROM t WHERE p` — the
    * predicate flavor, vs [[deleteWhereKeyIn]]'s O(delta) key flavor
    * and [[mergeCoW]]'s keyed remove): rewrite ONLY the files holding
    * at least one matching row, dropping the matches (SQL semantics: a
    * row is deleted when the predicate is TRUE; NULL keeps); every
    * other file carries verbatim. Affected files are found from one
    * read-through-snapshot scan tagged `input_file_name` (outstanding
    * equality deletes applied first, so suppressed rows never force a
    * rewrite); at 100 TB pair the predicate with a clustered layout so
    * parquet row-group stats prune the probe scan. Returns
    * (newVersion, filesCarried, filesRewritten); a no-match delete
    * commits NOTHING and returns the current version. */
  def deleteWhere(spark: SparkSession, root: String,
                  predicate: org.apache.spark.sql.Column)
      : (Int, Int, Int) =
    rewriteWhere(spark, root, predicate,
      affected => affected.where(!coalesce(predicate, lit(false))),
      validateCheck = false, kind = "rowdelete")

  /** ROW-LEVEL COPY-ON-WRITE UPDATE (`UPDATE t SET c = e WHERE p` —
    * the redaction/correction shape a takedown pipeline needs):
    * rewrite only the files holding matching rows, applying each
    * assignment to the matching rows (others pass through bit-
    * identical); CHECK constraints are validated on the rewritten
    * output BEFORE staging (affected-files-sized, documented — the
    * updated values must not sneak a violation in). Assignment columns
    * must exist; the schema never changes here (add columns via
    * [[append]] evolution). */
  def updateWhere(spark: SparkSession, root: String,
                  predicate: org.apache.spark.sql.Column,
                  assignments: Seq[(String, org.apache.spark.sql.Column)])
      : (Int, Int, Int) = {
    require(assignments.nonEmpty, "updateWhere needs at least one " +
      "SET assignment")
    require(assignments.map(_._1).distinct.size == assignments.size,
      "updateWhere: duplicate SET columns " +
        assignments.map(_._1).mkString(", "))
    rewriteWhere(spark, root, predicate,
      affected => {
        assignments.foreach { case (c, _) =>
          require(affected.schema.fieldNames.contains(c),
            s"updateWhere: no column $c in $root — the schema never " +
              "changes here (add columns via append evolution)") }
        // SQL UPDATE semantics: the predicate AND every SET expression
        // evaluate against the ORIGINAL row — one select resolves all
        // of them over the input frame at once (a sequential
        // withColumn fold would re-resolve the predicate and later
        // assignments against already-updated columns: `SET a = b,
        // b = a` would lose a, and a predicate on an assigned column
        // would un-match its own matches)
        val matched = coalesce(predicate, lit(false))
        val asg = assignments.toMap
        affected.select(affected.schema.fieldNames.toSeq.map { c =>
          asg.get(c)
            .map(e => when(matched, e.cast(affected.schema(c).dataType))
              .otherwise(col(c)).as(c))
            .getOrElse(col(c))
        }: _*)
      },
      validateCheck = true, kind = "rowupdate",
      assignedCols = assignments.map(_._1))
  }

  /** Shared CoW row-rewrite: probe for affected files, transform their
    * (delete-applied) rows, carry everything else verbatim — headers,
    * schema, outstanding delete files, writer markers all unchanged;
    * fresh files re-stamp the table's declared bounds/stats/blooms. */
  private def rewriteWhere(spark: SparkSession, root: String,
                           predicate: org.apache.spark.sql.Column,
                           transform: DataFrame => DataFrame,
                           validateCheck: Boolean, kind: String,
                           assignedCols: Seq[String] = Seq.empty)
      : (Int, Int, Int) = {
    val fs = fsOf(spark, new Path(root))
    val baseVersion = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"no committed version under $root"))
    val m = loadManifest(fs, root, baseVersion)
    require(m.dataEntries.nonEmpty,
      s"version $baseVersion of $root lists no data files")
    val qToRel = m.dataEntries.map(e =>
      fs.makeQualified(new Path(root, e.rel)).toString -> e.rel).toMap
    // tag the file name AT THE SCAN, before the delete anti-join: an
    // exchange in that join (delete set above the broadcast threshold)
    // would evaluate input_file_name() on post-shuffle rows — empty
    // strings, not file names (the same ordering mergeCoW's unbounded
    // probe uses)
    val fileTag = "__graft_input_file" // no collision with table cols
    val snap = applyDeletes(spark, root,
      readFiles(spark, m.dataEntries.map(e =>
          new Path(root, e.rel).toString), m.schema)
        .withColumn(fileTag, input_file_name()), m)
    val affectedRels = snap.where(predicate)
      .select(fileTag).distinct()
      .collect().flatMap(r => // O(files) rows — bounded collect
        qToRel.get(fs.makeQualified(new Path(r.getString(0))).toString))
      .toSet
    if (affectedRels.isEmpty)
      return (baseVersion, m.dataEntries.size, 0)
    val (rewriteE, carryE) =
      m.dataEntries.partition(e => affectedRels.contains(e.rel))
    val affectedRows = applyDeletes(spark, root,
      readFiles(spark, rewriteE.map(e =>
        new Path(root, e.rel).toString), m.schema), m)
    val rewritten = transform(affectedRows)
    if (validateCheck) validateConstraints(rewritten, m.headers.collect {
      case (hk, hv) if hk.startsWith(ConstraintPrefix) =>
        hk.stripPrefix(ConstraintPrefix) -> hv
    }.toMap, s"rewrite of $root")
    // RESURRECTION GUARD, rewrite-side: an assignment that SETs a
    // delete-key column can write a suppressed key INTO the rewritten
    // rows — they would silently vanish from every read (the delete
    // files carry verbatim below). The same guard append runs on
    // incoming rows, run on the rewritten output exactly when an
    // assignment targets a delete-key column (delta×affected-sized).
    if (m.deleteEntries.nonEmpty &&
        assignedCols.exists(m.deleteCols.contains)) {
      val ks = m.deleteCols
      val delKeys = spark.read.parquet(m.deleteEntries.map(e =>
          new Path(root, e.rel).toString): _*)
        .select(ks.map(col): _*).distinct()
      require(rewritten.join(delKeys, ks, "left_semi").take(1).isEmpty,
        s"rewrite of $root would SET (${ks.mkString(", ")}) to " +
          "equality-deleted key(s) — the rewritten rows would be " +
          "suppressed by the outstanding delete set on every read; " +
          "run optimize first, or assign a non-deleted key")
    }
    def stampable(k: String) = rewritten.schema.fieldNames.contains(k) &&
      scala.util.Try(statExpr(rewritten.schema, k)).isSuccess
    val stampCol = m.boundsCol.filter(k =>
      rewritten.schema.fieldNames.contains(k) &&
        isIntegral(rewritten.schema(k).dataType))
    // re-align to the committed schema: the transform's replaced
    // columns lost their field-id metadata (and the file tag is
    // dropped here too)
    val rewrittenOut = m.schema.map(alignToSchema(rewritten, _))
      .getOrElse(rewritten.drop(fileTag))
    val staged = stage(spark, root,
      dir => rewrittenOut.write.parquet(dir), allowEmpty = true,
      boundsCol = stampCol, statsCols = m.statsCols.filter(stampable),
      bloomCols = m.bloomCols.filter(stampable))
    require(carryE.nonEmpty || staged.nonEmpty,
      s"the rewrite would leave $root with no data files; " +
        "use overwrite to truncate a table")
    val outLines = carryE.map(_.line) ++ staged ++
      m.deleteEntries.map(_.line)
    if (!tryCommit(fs, root, baseVersion + 1, outLines,
        m.headers + (KindKey -> kind)))
      throw new java.util.ConcurrentModificationException(
        s"rewrite of $root lost the commit race for version " +
          s"${baseVersion + 1}; rerun against the new base")
    (baseVersion + 1, carryE.size, staged.size)
  }

  /** Q152: the manifest lifecycle end-to-end, hash-gated — build the
    * documents table as a manifest table (v1 = 80% of docs), APPEND the
    * rest (v2), OPTIMIZE clustered on doc_id (v3), then read ALL THREE
    * versions by time travel and emit each one's totals. The oracle
    * recomputes v1's subset and the full table directly from parquet, so
    * the hash gate pins the three commit semantics at once: append
    * accumulates (v2 = all docs), optimize changes NO row (v3 == v2 —
    * the rewrite is invisible to readers except in file count), and
    * history stays readable after later commits. sum(doc_id) makes a
    * row-identity slip (not just a count slip) hash-visible. */
  def q152ManifestLifecycle(spark: SparkSession,
                            sfDir: String): DataFrame = {
    val root = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_docs_" + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    overwrite(spark, root, docs.where(col("doc_id") % 5 =!= 0))
    append(spark, root, docs.where(col("doc_id") % 5 === 0))
    optimize(spark, root, "doc_id", targetFiles = 4)
    val perVersion = (1 to 3).map { v =>
      readAt(spark, root, v)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_doc_id"),
          sum(length(col("text"))).as("n_chars"))
        .select(lit(v).cast("int").as("version"),
          col("n_docs"), col("sum_doc_id"), col("n_chars"))
    }
    perVersion.reduce(_ unionByName _).orderBy("version")
  }

  /** An unreferenced data file younger than this may be an IN-FLIGHT
    * append's staging (stage happens before the manifest rename), not a
    * crash orphan — vacuum must not delete it, or the append commits a
    * manifest pointing at deleted files. Same reason Delta's VACUUM has
    * a retention window. */
  val DefaultOrphanRetentionMs: Long = 24L * 60 * 60 * 1000

  /** Q155: the recrawl applied as a copy-on-write MERGE — the documents
    * table lives as a manifest table (v1 = snapshot A, written as 8
    * doc_id-clustered files so files have real key ranges), the q79
    * delta lands in ONE [[mergeCoW]] commit (deletes + edits + inserts),
    * and the result must BE snapshot B row-for-row: the oracle replays
    * the recrawl rules directly over the parquet and compares doc_id +
    * md5(text) — so a dropped carried file, a surviving removed row, a
    * lost concurrent row, or an unapplied edit all fire the hash gate.
    * Diagnostics (files carried vs rewritten) are the spec's job; at
    * the q79 delta every file contains changed keys (doc_id % 10 rules
    * touch every range), so carry-over is exercised by the spec's
    * range-local delta instead. */
  def q155ManifestMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val root = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_merge_" + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val docs = graft.Tables.documents(spark, sfDir)
    // bounds-stamped write (manifest format v2): the merge below finds
    // its affected files from the manifest alone, no snapshot scan
    overwrite(spark, root,
      docs.repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      boundsCol = Some("doc_id"))
    // the q79 recrawl rules as one merge: delete %10==7, edit %10==3,
    // insert the %10==1 docs under the negative namespace
    val removeKeys = docs.where(col("doc_id") % 10 === 7).select("doc_id")
    val upserts = graft.operators.CurationPipeline.snapshotB(docs)
      .where(col("doc_id") % 10 === 3 || col("doc_id") < 0)
    mergeCoW(spark, root, "doc_id", removeKeys, upserts)
    read(spark, root)
      .select(col("doc_id"), md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** Q156: the bounds-pruned RANGE READ, hash-gated — the documents
    * table as a bounds-stamped manifest table (8 doc_id-clustered
    * files), then [[readWhereKeyBetween]] over the lowest fifth of the
    * id domain: the file set is decided from the manifest header +
    * per-file [lo, hi] alone (no footer reads — the spec pins
    * inputFiles < total), and the oracle recomputes the same range
    * directly from parquet, so a wrongly-pruned file (missing rows) or
    * an unapplied residual filter (extra rows) fires the hash gate. The
    * range bounds are integer arithmetic over min/max, identical on
    * both engines. */
  def q156ManifestPrunedRead(spark: SparkSession,
                             sfDir: String): DataFrame = {
    val root = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_pruned_" + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    overwrite(spark, root,
      docs.repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      boundsCol = Some("doc_id"))
    val mm = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (lo, hi) = (mm.getLong(0),
      mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 5)
    readWhereKeyBetween(spark, root, "doc_id", lo, hi)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_doc_id"),
        sum(length(col("text"))).as("n_chars"))
      .orderBy("lang")
  }

  /** Q158: SCHEMA EVOLUTION, hash-gated — the documents table committed
    * WITHOUT a lang column (v1), then an append that ADDS it (v2:
    * add-column evolution widens the committed `#schema=` header), read
    * back as one relation: pre-evolution rows surface lang as null
    * (grouped under a sentinel), post-evolution rows carry it. The
    * oracle replays the same two-phase union with a NULL lang for the
    * first subset, so a silently-dropped column, a misresolved old
    * file, or a wrong null-fill all fire the hash gate. Time-travel
    * schema (v1 has no lang at all) is the spec's pin. */
  /** Q163: format v5's point lookup, hash-gated — build lineitem as a
    * manifest table CLUSTERED on l_orderkey (so l_partkey is scattered:
    * every file's [lo, hi] on it spans the domain and stats alone prune
    * nothing) with `bloomCols = l_partkey`, then answer
    * `l_partkey IN (5 probe keys)` through [[readWherePointIn]]. The
    * oracle runs the same IN directly on parquet, so the hash gate pins
    * the no-false-negative contract: blooms may keep a wasted file,
    * they may never drop a matching row. The spec pins the pruning
    * itself (files opened ≪ files listed) — a correctness gate can't,
    * since skipping is invisible in the result by design. */
  def q163ManifestBloomPoint(spark: SparkSession,
                             sfDir: String): DataFrame = {
    val root = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_bloom_" + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    overwrite(spark, root,
      li.repartitionByRange(8, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey"),
      boundsCol = Some("l_orderkey"),
      bloomCols = Seq("l_partkey"))
    // deterministic probes: the 5 smallest part keys present (bounded
    // 5-row collect, same at every sf)
    val probes = li.select(col("l_partkey")).distinct()
      .orderBy(col("l_partkey")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    readWherePointIn(spark, root, "l_partkey", probes)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_orderkey")).as("sum_orderkey"),
        // integer-exact quantity sum: addition-order independent
        sum(round(col("l_quantity")).cast("long")).as("sum_qty"))
      .orderBy(col("l_partkey"))
  }

  /** Q169: merge-on-read equality deletes end to end, hash-gated —
    * land documents as a manifest table, DELETE every doc_id ≡ 2
    * (mod 5) as one O(delta) delete commit (zero data-file IO, every
    * data file carried verbatim — the spec pins that), read the table
    * in BOTH regimes: 'mor' (outstanding delete files, readers
    * anti-join) and 'compacted' (optimize applied + dropped the
    * deletes). Both stages must equal the oracle's filtered aggregate
    * — the apply-at-read and apply-at-compaction paths cannot drift. */
  def q169ManifestEqualityDelete(spark: SparkSession,
                                 sfDir: String): DataFrame = {
    val root = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_eqdel_" + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
    overwrite(spark, root,
      docs.repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      boundsCol = Some("doc_id"))
    deleteWhereKeyIn(spark, root, "doc_id",
      docs.where(pmod(col("doc_id"), lit(5)) === 2).select("doc_id"))
    def aggOf(stage: String): DataFrame =
      read(spark, root).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_doc_id"))
        .withColumn("stage", lit(stage))
    val mor = aggOf("1_mor").localCheckpoint() // pin BEFORE compaction
    optimize(spark, root, "doc_id", 4)
    mor.unionByName(aggOf("2_compacted"))
      .select("stage", "lang", "n_docs", "sum_doc_id")
      .orderBy("stage", "lang")
  }

  /** Q173: DESCRIBE HISTORY + time travel by TIMESTAMP, hash-gated on
    * the versioned contents — three commits land documents in thirds;
    * the query asserts the history invariants the wall-clock makes
    * un-hashable (one CommitInfo per version, commit instants
    * non-decreasing, metadata row counts exact, `readAtTimestamp` at
    * each commit's own instant resolving to exactly that version, a
    * pre-history timestamp failing loudly), then emits each version's
    * aggregate — which the oracle recomputes from the slice
    * definitions, so a wrong version resolution is hash-fatal. */
  def q173HistoryTimeTravel(spark: SparkSession,
                            sfDir: String): DataFrame = {
    val root = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_history_" + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
    overwrite(spark, root, docs.where(pmod(col("doc_id"), lit(3)) === 0))
    append(spark, root, docs.where(pmod(col("doc_id"), lit(3)) === 1))
    append(spark, root, docs.where(pmod(col("doc_id"), lit(3)) === 2))
    val h = history(spark, root)
    require(h.map(_.version) == Seq(1, 2, 3) &&
      h.forall(_.deleteFiles == 0) &&
      h.map(_.timestampMs) == h.map(_.timestampMs).sorted,
      s"history shape wrong: $h")
    h.foreach { c =>
      require(c.rows.contains(readAt(spark, root, c.version).count()),
        s"metadata row count drifted at v${c.version}")
      require(readAtTimestamp(spark, root, c.timestampMs)
        .count() == c.rows.get,
        s"timestampAsOf at v${c.version}'s own instant resolved wrong")
    }
    require(scala.util.Try(
      readAtTimestamp(spark, root, h.head.timestampMs - 1)).isFailure,
      "a pre-history timestamp must fail loudly, not serve a later " +
        "version")
    h.map(c => readAt(spark, root, c.version)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_doc_id"))
        .withColumn("version", lit(c.version)))
      .reduce(_ unionByName _)
      .select("version", "n_docs", "sum_doc_id")
      .orderBy("version")
  }

  /** Q174: CHECK constraints end to end, hash-gated — a constrained
    * table accepts two valid ingests (append + CoW merge), REJECTS a
    * violating append, a violating merge, and a constraint declared
    * over already-violating data (all three loudly, table unchanged —
    * asserted inside the query), and the constraint survives a
    * compaction. The oracle recomputes the final state arithmetically,
    * so an ingest that slipped a rejected batch in (or lost a valid
    * one) is hash-fatal. */
  def q174CheckConstraints(spark: SparkSession,
                           sfDir: String): DataFrame = {
    val root = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_check_" + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
    overwrite(spark, root, li.where(pmod(col("l_orderkey"), lit(2)) === 0))
    addConstraint(spark, root, "non_negative_price", "price_cents >= 0")
    // valid ingests pass: one append, one keyed CoW merge
    append(spark, root,
      li.where(pmod(col("l_orderkey"), lit(2)) === 1))
    val bump = li.where(col("l_orderkey") === 1)
      .withColumn("price_cents", col("price_cents") + 1)
    mergeCoW(spark, root, "l_orderkey",
      removeKeys = bump.select("l_orderkey").limit(0),
      // a merge keys whole orders: replace order 1's rows wholesale
      upserts = bump)
    val vBefore = currentVersion(spark, root)
    // violating ingests are rejected loudly, table untouched
    require(scala.util.Try(append(spark, root,
      li.limit(3).withColumn("price_cents", lit(-1L)))).isFailure,
      "violating append was accepted")
    require(scala.util.Try(mergeCoW(spark, root, "l_orderkey",
      bump.select("l_orderkey").limit(0),
      bump.withColumn("price_cents", lit(-5L)))).isFailure,
      "violating merge was accepted")
    require(scala.util.Try(addConstraint(spark, root,
      "impossible", "l_orderkey < 0")).isFailure,
      "a constraint over violating data was accepted")
    require(currentVersion(spark, root) == vBefore,
      "a rejected ingest changed the table")
    // the constraint survives compaction
    optimize(spark, root, "l_orderkey", 4)
    require(constraintsOf(spark, root)
      == Map("non_negative_price" -> "price_cents >= 0"),
      "compaction shed the constraint")
    read(spark, root).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("price_cents")).as("sum_price_cents"))
      .orderBy("l_returnflag")
  }

  /** Q179: COPY-ON-WRITE MERGE OVER OUTSTANDING EQUALITY DELETES
    * (delete sequencing), hash-gated — documents land clustered on
    * doc_id, a MoR delete suppresses every doc_id ≡ 1 (mod 3), then
    * ONE [[mergeCoW]] interleaves all three delete-sequencing cases:
    * plain removes (doc_id ≡ 4 (mod 10) — some deleted, some live),
    * RESURRECTING upserts (doc_id ≡ 7 (mod 10): 7 mod 3 = 1 ⊂ deleted;
    * 17 mod 3 = 2 live — mixed), and untouched deleted keys that must
    * STAY suppressed via the consolidated delete file the merge
    * carries forward. The oracle recomputes the final state from the
    * rules over raw parquet and compares doc_id + md5(text), so a
    * resurrected row that stayed suppressed, a suppressed row that
    * leaked, a lost remove, or an unapplied upsert is hash-fatal.
    * The spec pins the mechanics (consolidated delete file, carried
    * files untouched, optimize afterwards agreeing). */
  def q179MergeOverDeletes(spark: SparkSession, sfDir: String): DataFrame = {
    val root = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_mergedel_" + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    overwrite(spark, root,
      docs.repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      boundsCol = Some("doc_id"))
    deleteWhereKeyIn(spark, root, "doc_id",
      docs.where(pmod(col("doc_id"), lit(3)) === 1).select("doc_id"))
    mergeCoW(spark, root, "doc_id",
      removeKeys = docs.where(pmod(col("doc_id"), lit(10)) === 4)
        .select("doc_id"),
      upserts = docs.where(pmod(col("doc_id"), lit(10)) === 7)
        .withColumn("text", concat(col("text"), lit(" upd"))))
    read(spark, root)
      .select(col("doc_id"), md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** Q187: COMPOSITE equality deletes (multi-column `#deletecol=`,
    * Iceberg's multi-column equality-delete shape), hash-gated — the
    * lineitem table keyed by the (l_orderkey, l_linenumber) TUPLE
    * takes one O(delta) delete commit of the tuples matching
    * `orderkey ≡ 0 (mod 5) ∧ linenumber odd` (zero data-file IO —
    * every data file carried verbatim), read in BOTH regimes ('mor':
    * readers anti-join the tuple set; 'compacted': optimize applies
    * and drops it). Both stages must equal the oracle's complement
    * aggregate — a row suppressed on a partial tuple match (the
    * single-column bug a composite delete exists to avoid) changes
    * counts and fires the gate. The one-column-SET-per-table rule,
    * the tuple resurrection guard, and the merge rejection are
    * spec-pinned. */
  def q187CompositeDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val root = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_compdel_" + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
    overwrite(spark, root,
      li.repartitionByRange(8, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey"),
      boundsCol = Some("l_orderkey"))
    deleteWhereKeysIn(spark, root, Seq("l_orderkey", "l_linenumber"),
      li.where(pmod(col("l_orderkey"), lit(5)) === 0 &&
          pmod(col("l_linenumber"), lit(2)) === 1)
        .select("l_orderkey", "l_linenumber"))
    def aggOf(stage: String): DataFrame =
      read(spark, root).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("price_cents")).as("sum_price_cents"))
        .withColumn("stage", lit(stage))
    val mor = aggOf("1_mor").localCheckpoint() // pin BEFORE compaction
    optimize(spark, root, "l_orderkey", 4)
    mor.unionByName(aggOf("2_compacted"))
      .select("stage", "l_returnflag", "n_rows", "sum_price_cents")
      .orderBy("stage", "l_returnflag")
  }

  /** Q191: TUPLE-KEYED COPY-ON-WRITE MERGE OVER OUTSTANDING COMPOSITE
    * EQUALITY DELETES (q179's delete-sequencing gate on a q187-shaped
    * table), hash-gated — lineitem keyed by the (l_orderkey,
    * l_linenumber) TUPLE: a composite MoR delete suppresses every
    * `orderkey ≡ 0 (mod 5) ∧ linenumber odd` tuple, then ONE
    * [[mergeCoWKeys]] interleaves all three sequencing cases at tuple
    * granularity — removes of LIVE tuples (orderkey ≡ 4 (mod 10) —
    * disjoint from the ≡0 (mod 5) delete set) AND removes of
    * SUPPRESSED tuples (orderkey ≡ 0 (mod 10), odd linenumbers — every
    * one sits in the delete set: the remove must make its delete moot,
    * dropping the tuple from the consolidated delete file without
    * resurrecting anything), RESURRECTING upserts (orderkey ≡ 5 (mod 10):
    * its odd-linenumber tuples sit in the delete set, its even ones
    * are live — mixed), and untouched deleted tuples that must STAY
    * suppressed via the consolidated delete file the merge carries
    * forward. The oracle replays the rules over raw parquet; a row
    * resurrected on a partial tuple match (the single-column bug),
    * a suppressed tuple that leaked, a lost remove, or an unapplied
    * upsert shifts the identity-weighted aggregate and fires the hash
    * gate. Mechanics (consolidated delete file, leading-column file
    * pruning, whole-tuple guard, mismatched-key rejection) are
    * spec-pinned. */
  def q191CompositeMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val root = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_compmerge_" + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
    overwrite(spark, root,
      li.repartitionByRange(8, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey"),
      boundsCol = Some("l_orderkey"))
    deleteWhereKeysIn(spark, root, Seq("l_orderkey", "l_linenumber"),
      li.where(pmod(col("l_orderkey"), lit(5)) === 0 &&
          pmod(col("l_linenumber"), lit(2)) === 1)
        .select("l_orderkey", "l_linenumber"))
    mergeCoWKeys(spark, root, Seq("l_orderkey", "l_linenumber"),
      removeKeys = li.where(pmod(col("l_orderkey"), lit(10)) === 4 ||
          (pmod(col("l_orderkey"), lit(10)) === 0 &&
            pmod(col("l_linenumber"), lit(2)) === 1))
        .select("l_orderkey", "l_linenumber"),
      upserts = li.where(pmod(col("l_orderkey"), lit(10)) === 5)
        .withColumn("price_cents", col("price_cents") + 7))
    read(spark, root)
      .groupBy(col("l_returnflag"),
        pmod(col("l_orderkey"), lit(10)).as("okey_mod"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("price_cents")).as("sum_price_cents"),
        sum(col("l_orderkey") * col("l_linenumber")).as("sum_key_product"))
      .orderBy("l_returnflag", "okey_mod")
  }

  /** Q184: ROW-LEVEL COPY-ON-WRITE UPDATE ([[updateWhere]] — the
    * redaction/correction shape: a takedown rewrites ONLY the files
    * holding matching rows), hash-gated — every doc_id ≡ 0 (mod 9)
    * gets its lang reset to the redaction sentinel and its text
    * suffixed; non-matching rows must pass through BIT-IDENTICAL
    * (md5(text) hashes the whole corpus, so a mangled carried or
    * pass-through row anywhere is hash-fatal). The oracle replays the
    * CASE arithmetic over raw parquet. The no-match no-op, the
    * constraint gate on updated values, and carried-vs-rewritten file
    * counts are the spec's pins. */
  def q184UpdateWhere(spark: SparkSession, sfDir: String): DataFrame = {
    val root = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_update_" + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    overwrite(spark, root,
      docs.repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      boundsCol = Some("doc_id"))
    updateWhere(spark, root, pmod(col("doc_id"), lit(9)) === 0, Seq(
      "lang" -> lit("xx"),
      "text" -> concat(col("text"), lit(" [redacted]"))))
    read(spark, root)
      .select(col("doc_id"), col("lang"), md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  def q158SchemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val root = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_evo_" + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val docs = graft.Tables.documents(spark, sfDir)
    overwrite(spark, root,
      docs.where(col("doc_id") % 3 =!= 0).select("doc_id", "text"))
    append(spark, root,
      docs.where(col("doc_id") % 3 === 0).select("doc_id", "text", "lang"))
    read(spark, root)
      .groupBy(coalesce(col("lang"), lit("pre_evolution")).as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_doc_id"),
        sum(length(col("text"))).as("n_chars"))
      .orderBy("lang")
  }

  /** Q198: FIELD-ID SCHEMA EVOLUTION ACROSS A FULL add → rename → drop
    * HISTORY, hash-gated — the documents table evolves through six
    * commits (create two-column → ADD lang header-only → append
    * three-column rows → RENAME lang→language header-only → append
    * rows written under the NEW name → DROP text header-only), so the
    * final table mixes files written under THREE namings/widths; the
    * query aggregates THREE regimes — post-add (v3, time travel),
    * post-rename (v5, time travel: files named `lang` and `language`
    * must merge BY FIELD ID under the renamed schema), and the
    * current post-drop mask — and the oracle replays each regime's
    * row set from raw parquet. A rename that nulled the old files'
    * values, a drop that leaked, or a time travel serving the wrong
    * regime shifts a group and is hash-fatal. The header-only pins
    * (same files across ALTERs), the re-add-gets-fresh-id
    * no-resurrection rule, and every rejection are
    * ManifestTableSpec's pins. */
  def q198FieldIdEvolution(spark: SparkSession,
                           sfDir: String): DataFrame = {
    val root = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_fid_" + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val docs = graft.Tables.documents(spark, sfDir)
    overwrite(spark, root,                                       // v1
      docs.where(col("doc_id") % 3 =!= 0).select("doc_id", "text"))
    addColumns(spark, root, Seq(StructField("lang",              // v2
      org.apache.spark.sql.types.StringType)))
    append(spark, root,                                          // v3
      docs.where(col("doc_id") % 3 === 0)
        .select("doc_id", "text", "lang"))
    renameColumn(spark, root, "lang", "language")                // v4
    append(spark, root,                                          // v5
      docs.where(col("doc_id") % 10 === 1)
        .select((-(col("doc_id") + 1)).as("doc_id"), col("text"),
          col("lang").as("language")))
    dropColumn(spark, root, "text")                              // v6
    def regime(df: DataFrame, langCol: String, stage: String,
               chars: org.apache.spark.sql.Column): DataFrame =
      df.groupBy(coalesce(col(langCol), lit("pre_evolution"))
          .as("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_doc_id"), chars.as("n_chars"))
        .withColumn("stage", lit(stage))
    regime(readAt(spark, root, 3), "lang", "1_added",
        sum(length(col("text"))))
      .unionByName(regime(readAt(spark, root, 5), "language",
        "2_renamed", sum(length(col("text")))))
      .unionByName(regime(read(spark, root), "language",
        "3_dropped", max(lit(-1L))))
      .select("stage", "lang", "n_docs", "sum_doc_id", "n_chars")
      .orderBy("stage", "lang")
  }

  /** Q199: WRITABLE BRANCHES — WRITE-AUDIT-PUBLISH, hash-gated: a
    * recrawl merge is STAGED on branch `audit` (commits invisible to
    * every main read), audited through BOTH surfaces (Scala
    * [[readBranch]] and SQL `VERSION AS OF 'audit'` — the spec pins
    * they agree), and published as ONE main commit; a main-line append
    * lands DURING the branch life and must survive the publish
    * (file-granularity rebase over append-only main movement). Three
    * stages gate the isolation story: `1_main_pre` (pre-publish main —
    * the staged merge must be invisible, the concurrent append
    * visible), `2_branch_audit` (the branch head — merge applied,
    * concurrent append invisible: the audit sees exactly what it
    * approves), `3_published` (merge + append together). The oracle
    * replays all three from the rules; a leaked staged row, a lost
    * concurrent append, or a publish that resurrected a removed row is
    * hash-fatal. Conflict rejections (non-append main movement, schema
    * /constraint drift, vacuumed gaps), the vacuum retention floor,
    * and dropBranch are ManifestTableSpec's pins. */
  def q199BranchWap(spark: SparkSession, sfDir: String): DataFrame = {
    val key = graft.Tables.dirKey(spark, sfDir)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val root = new Path(wh, s"manifest_wap_$key").toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    overwrite(spark, root,                                        // v1
      docs.repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      boundsCol = Some("doc_id"))
    createBranch(spark, root, "audit")                            // v2
    // a main-line append DURING the branch life (the negative
    // namespace — disjoint from the staged merge's key ranges)
    append(spark, root,                                           // v3
      docs.where(pmod(col("doc_id"), lit(10)) === 1)
        .select((-(col("doc_id") + 1)).as("doc_id"), col("lang"),
          col("text")),
      boundsCol = Some("doc_id"))
    // the STAGED merge, on the branch: remove ≡7, edit ≡3 (mod 10)
    mergeCoWKeys(spark, root, Seq("doc_id"),
      removeKeys = docs.where(pmod(col("doc_id"), lit(10)) === 7)
        .select("doc_id"),
      upserts = docs.where(pmod(col("doc_id"), lit(10)) === 3)
        .withColumn("text", concat(col("text"), lit(" v2"))),
      branch = Some("audit"))
    def agg(df: DataFrame, stage: String): DataFrame =
      df.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_doc_id"),
          sum(length(col("text"))).as("n_chars"))
        .withColumn("stage", lit(stage))
        .localCheckpoint() // pinned BEFORE publish mutates the table
    val mainPre = agg(read(spark, root), "1_main_pre")
    val auditRead = agg(readBranch(spark, root, "audit"),
      "2_branch_audit")
    publishBranch(spark, root, "audit")                           // v4
    mainPre.unionByName(auditRead)
      .unionByName(agg(read(spark, root), "3_published"))
      .select("stage", "lang", "n_docs", "sum_doc_id", "n_chars")
      .orderBy("stage", "lang")
  }

  /** Q159: MANIFEST STATISTICS, hash-gated — per-version row counts of a
    * three-commit table (overwrite, append, optimize) answered FROM THE
    * MANIFEST'S v3 STATS ALONE: no data file is opened for the counts
    * (the spec pins that [[rowCountFromStats]] is defined and that a
    * scan agrees); the oracle recomputes each version's subset count
    * directly from parquet, so a mis-stamped row count anywhere fires
    * the hash gate. This is the metadata-only `count(*)` every format's
    * file statistics exist for. */
  def q159ManifestStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val root = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_stats_" + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    overwrite(spark, root,
      docs.where(col("doc_id") % 5 =!= 0)
        .repartitionByRange(6, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      boundsCol = Some("doc_id"))
    append(spark, root, docs.where(col("doc_id") % 5 === 0),
      boundsCol = Some("doc_id"))
    optimize(spark, root, "doc_id", targetFiles = 3)
    (1 to 3).map { v =>
      val n = rowCountFromStats(spark, root, Some(v)).getOrElse(
        throw new IllegalStateException(
          s"version $v of $root lacks v3 row-count stats"))
      (v, n)
    }.toDF("version", "n_rows").orderBy("version")
  }

  /** Q160: SCD2 HISTORY BY TAILING MANIFEST COMMITS — the dimension-
    * maintenance pattern the CDC read (q157) exists for, run over a
    * MULTI-commit history: the documents table takes two successive
    * copy-on-write recrawl merges (v2 = the q79 rules, v3 = a second
    * delete+edit wave), and the type-2 slowly-changing dimension
    * (doc_id, text_md5, [valid_from, valid_to) in VERSION numbers,
    * is_current) is folded INCREMENTALLY: one [[readChangesBetween]]
    * per commit closes the open rows of removed/modified keys and opens
    * rows for added/modified ones — each fold step is delta-file-sized
    * (carried files never surface), and no snapshot pair is ever
    * re-diffed. The oracle reconstructs the same history independently
    * (three snapshot CTEs + gaps-and-islands runs over version-stamped
    * hashes), so a missed close, a phantom open, or a wrong validity
    * bound anywhere in the fold fires the hash gate. At 100 TB this is
    * how a dimension table tracks a fact table that rewrites daily:
    * consume commits, never compare corpora. */
  def q160ManifestScd2(spark: SparkSession, sfDir: String): DataFrame = {
    val root = buildScd2DemoTable(spark, sfDir, "manifest_scd2_")
    // the SCD2 fold: seed from v1, then apply each commit's CDC delta
    var scd = scd2Seed(readAt(spark, root, 1))
    val latest = currentVersion(spark, root).get
    for (v <- 2 to latest) {
      scd = scd2Step(scd,
        graft.operators.CurationPipeline.cdcDocDelta(spark, root, v - 1, v),
        v)
        .localCheckpoint() // keep the fold's lineage flat across commits
    }
    presentScd2(scd)
  }

  /** The three-commit documents history q160/q161 fold: v1 = the raw
    * table (8 doc_id-clustered bounds-stamped files), v2 = the q79
    * recrawl as one CoW merge, v3 = a second delete+edit wave over the
    * current table (positive ids only — the synthetic namespace stays
    * put). Returns the table root (rebuilt fresh per call). */
  private[graft] def buildScd2DemoTable(spark: SparkSession, sfDir: String,
                                        prefix: String): String = {
    val root = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      prefix + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(root))
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    overwrite(spark, root,
      docs.repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      boundsCol = Some("doc_id"))
    mergeCoW(spark, root, "doc_id",
      docs.where(col("doc_id") % 10 === 7).select("doc_id"),
      graft.operators.CurationPipeline.snapshotB(docs)
        .where(col("doc_id") % 10 === 3 || col("doc_id") < 0))
    val cur = readAt(spark, root, 2)
    mergeCoW(spark, root, "doc_id",
      cur.where(col("doc_id") > 0 && col("doc_id") % 10 === 9)
        .select("doc_id"),
      cur.where(col("doc_id") > 0 && col("doc_id") % 10 === 4)
        .withColumn("text", concat(col("text"), lit(" updated v3"))))
    root
  }

  /** SCD2 state seeded from a table's FIRST committed version. */
  private[graft] def scd2Seed(snapshotV1: DataFrame): DataFrame =
    snapshotV1.select(col("doc_id"), md5(col("text")).as("text_md5"),
      lit(1).as("valid_from"), lit(null).cast("int").as("valid_to"))

  /** One SCD2 fold step: close the open rows of removed/modified keys
    * at version `v`, open rows for added/modified ones — `delta` is a
    * reconciled row-level change relation
    * ([[graft.operators.CurationPipeline.cdcDocDelta]]'s shape). */
  private[graft] def scd2Step(base: DataFrame, deltaIn: DataFrame,
                              v: Int): DataFrame = {
    val delta = deltaIn.localCheckpoint() // delta-sized; read twice
    val closing = delta
      .where(col("change").isin("removed", "modified"))
      .select(col("doc_id"), lit(1).as("_close"))
    val opening = delta
      .where(col("change").isin("added", "modified"))
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        lit(v).as("valid_from"), lit(null).cast("int").as("valid_to"))
    base
      .join(closing, Seq("doc_id"), "left")
      .withColumn("valid_to",
        when(col("_close") === 1 && col("valid_to").isNull, lit(v))
          .otherwise(col("valid_to")))
      .drop("_close")
      .unionByName(opening)
  }

  private[graft] def presentScd2(scd: DataFrame): DataFrame =
    scd
      .withColumn("is_current",
        when(col("valid_to").isNull, 1).otherwise(0))
      .select("doc_id", "text_md5", "valid_from", "valid_to", "is_current")
      .orderBy("doc_id", "valid_from")

  /** Q161: the same SCD2 history as q160, maintained by the RESTARTABLE
    * version-tail runner ([[ManifestTail]]) instead of an in-memory
    * fold: each committed version is processed EXACTLY ONCE into a
    * persisted state dir (`v<N>` + `_SUCCESS`), the cursor is the
    * newest complete state, and a killed/restarted runner resumes from
    * it — the spec kills the catch-up mid-history and proves the resume
    * converges to the identical table; this query runs the full
    * catch-up and presents the final state, so the q160 oracle gates
    * the runner's end state row-for-row (one oracle, two maintenance
    * paths — q117/q142's shared-gate discipline). */
  def q161ManifestTailScd2(spark: SparkSession, sfDir: String): DataFrame = {
    val root = buildScd2DemoTable(spark, sfDir, "manifest_tail_")
    val stateDir = new Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_tailstate_" + graft.Tables.dirKey(spark, sfDir)).toString
    val fs = fsOf(spark, new Path(stateDir))
    if (fs.exists(new Path(stateDir))) fs.delete(new Path(stateDir), true)
    ManifestTail.catchUp(spark, root, stateDir)(
      seed = v1 => scd2Seed(v1),
      fold = (base, changes, v) => scd2Step(base,
        graft.operators.CurationPipeline.reconcileDocChanges(changes), v))
    presentScd2(ManifestTail.currentState(spark, stateDir).get)
  }

  /** Retire history: keep the newest `retain` manifests, delete older
    * manifest files, then delete data files in two classes —
    * (a) files referenced only by DROPPED manifests (committed history;
    * no in-flight writer can re-reference them, since append always
    * re-reads the newest manifest at commit time), deleted immediately;
    * (b) files referenced by NO manifest at all, deleted only when
    * older than `orphanRetentionMs` — a young never-referenced file may
    * be a concurrent append's staging (stage happens BEFORE the
    * manifest rename), and deleting it would let that append commit a
    * manifest pointing at deleted files. Stale `.tmp-*` manifests from
    * crashed commits are swept under the same retention window (a young
    * one may be a commit between its write and rename). Returns the
    * number of data files deleted. Time travel below the retained
    * window fails loudly in [[snapshot]] afterwards. */
  def vacuum(spark: SparkSession, root: String, retain: Int = 1,
             orphanRetentionMs: Long = DefaultOrphanRetentionMs): Int = {
    require(retain >= 1, "must retain at least the newest version")
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed version under $root")
    // named tags are a retention FLOOR (Iceberg's ref-retention shape):
    // a tagged version's manifest and files survive whatever `retain`
    // says — a tag must never dangle
    val newestHeaders = loadManifest(fs, root, vs.last).headers
    val tagged = newestHeaders.collect {
      case (k, hv) if k.startsWith(TagPrefix) &&
          hv.toIntOption.isDefined => hv.toInt
    }.toSet
    // LIVE branches pin like tags: the base version is a retention
    // floor (publish diffs against it) and every file a branch
    // manifest lists stays referenced. Pointers are read from EVERY
    // retained version's headers, not just the newest: a restore to a
    // pre-fork version rolls the pointer off the head (headers
    // replicate verbatim — the tag doctrine), and reaping the staged
    // branch work in the SAME breath would turn a recovery action
    // into silent data loss; the branch stays protected for as long
    // as any retained manifest still references it, and cleanup
    // converges as those versions retire.
    val liveBranches = vs.flatMap(v =>
      loadManifest(fs, root, v).headers.collect {
        case (k, hv) if k.startsWith(BranchPrefix) &&
            hv.toIntOption.isDefined =>
          k.stripPrefix(BranchPrefix) -> hv.toInt
      }).distinct
    val keepSet = vs.takeRight(retain).toSet ++
      tagged.filter(vs.contains) ++
      liveBranches.map(_._2).filter(vs.contains)
    val (drop, keep) = vs.partition(v => !keepSet.contains(v))
    // compare fully-QUALIFIED paths: listStatus returns scheme-qualified
    // paths (file:/..., hdfs://...) while manifests store root-relative
    // ones — an unqualified comparison would see every file as
    // unreferenced and delete live data
    def qualified(v: Int): Set[String] = manifestEntries(fs, root, v)
      .map(e => fs.makeQualified(new Path(root, e.rel)).toString).toSet
    val branchManifests: Seq[(String, Path)] =
      fs.listStatus(manifestDir(root)).toSeq.map(_.getPath).flatMap(p =>
        p.getName match {
          case BranchManifestName(n, _) => Some(n -> p)
          case _ => None
        })
    val liveNames = liveBranches.map(_._1).toSet
    val branchReferenced = branchManifests.collect {
      case (n, p) if liveNames.contains(n) =>
        loadManifestAt(fs, p).entries.map(e =>
          fs.makeQualified(new Path(root, e.rel)).toString).toSet
    }.fold(Set.empty[String])(_ ++ _)
    val referenced = keep.flatMap(qualified).toSet ++ branchReferenced
    val retired = drop.flatMap(qualified).toSet -- referenced
    // ORPHANED branch manifests (pointer dropped/published but the
    // best-effort cleanup died): sweep once aged — their files stop
    // being referenced here and age out through the same cutoff
    branchManifests.foreach { case (n, p) =>
      if (!liveNames.contains(n) &&
          fs.getFileStatus(p).getModificationTime <
            System.currentTimeMillis() - math.max(0L, orphanRetentionMs))
        fs.delete(p, false)
    }
    drop.foreach(v => fs.delete(manifestPath(root, v), false))
    val cutoff = System.currentTimeMillis() - math.max(0L, orphanRetentionMs)
    // crashed-commit manifest temps: never referenced by anything, but a
    // YOUNG one may be a tryCommit between create and rename
    fs.listStatus(manifestDir(root)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(".tmp-") &&
        s.getModificationTime < cutoff)
      .foreach(s => fs.delete(s.getPath, false))
    var deleted = 0
    // data files AND equality-delete files (format v6) retire the same
    // way: unreferenced by any retained manifest → collectable
    for (sub <- Seq("data", "deletes");
         dataDir = new Path(root, sub) if fs.exists(dataDir)) {
      fs.listStatus(dataDir).toSeq.filter(_.isDirectory).foreach { cd =>
        val files = fs.listStatus(cd.getPath).toSeq.filter(_.isFile)
        files.foreach { f =>
          val q = fs.makeQualified(f.getPath).toString
          val marker = f.getPath.getName.startsWith("_")
          val removable = !marker && !referenced.contains(q) &&
            (retired.contains(q) || f.getModificationTime < cutoff)
          if (removable) {
            fs.delete(f.getPath, false)
            deleted += 1
          }
        }
        val left = fs.listStatus(cd.getPath).toSeq
        if (left.forall(s => s.isFile && s.getPath.getName.startsWith("_")))
          fs.delete(cd.getPath, true) // only markers remain
      }
    }
    deleted
  }
}
