package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped MATERIALIZED ARTIFACTS — intermediate relations computed
  * once per (session, input dir) and persisted as bucketed tables that
  * every consumer query reads.
  *
  * Why this exists: AQE's ReuseExchange shares a subtree only WITHIN one
  * plan; across queries each consumer would recompute the full lineage
  * (round 3 measured the MinHash signature subtree running four times —
  * four full corpus passes for one logical artifact). At 100 TB a
  * production pipeline writes derived relations (shingles, signatures,
  * codebooks) as first-class catalog tables exactly once and feeds every
  * downstream stage from them; this registry is that story in miniature.
  *
  * Bucketed + sorted on the key column so key-keyed joins and aggregates
  * downstream skip their exchange (Spark reads bucket metadata as the
  * child's output partitioning).
  */
object Artifacts {
  /** Tables already materialized this JVM, per session (weak-keyed so a
    * discarded session's entries are collectable). */
  private val built =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Set[String]]

  private def builtSet(spark: SparkSession)
      : scala.collection.mutable.Set[String] = {
    var s = built.get(spark)
    if (s == null) {
      s = scala.collection.mutable.Set.empty
      built.put(spark, s)
    }
    s
  }

  /** The session that last built each table name — the enforcement half
    * of the single-active-session assumption: a SECOND live session
    * rebuilding the same name would delete warehouse files the first
    * session's live plans still reference, so that is an error, not a
    * silent rebuild. A stopped (or garbage-collected — the reference is
    * weak, so a dead session doesn't stay pinned for the JVM's life)
    * builder releases its claim; a DISCARDED-but-uncollected child
    * session (spark.newSession() shares the SparkContext, so it can
    * never be "stopped" on its own) must release explicitly via
    * [[release]] — otherwise every other session gets a
    * GC-timing-dependent IllegalStateException for its table names. */
  private val builders = scala.collection.mutable.Map
    .empty[String, java.lang.ref.WeakReference[SparkSession]]

  /** Explicitly release every table claim held by `spark` — the hook for
    * short-lived child sessions (spark.newSession()), which share the
    * SparkContext and therefore never read as stopped: call this when
    * discarding one so its claims don't linger until an arbitrary GC.
    * The warehouse tables themselves stay in place; the next session to
    * materialize the same name takes ownership (and rebuilds). */
  def release(spark: SparkSession): Unit = built.synchronized {
    builders.filterInPlace((_, ref) => ref.get ne spark)
    built.remove(spark)
    ()
  }

  /** Run `build` once per (session, name), persist it bucketed on
    * `bucketCol`, and return the table. Reentrant: a build may itself
    * materialize another artifact (signatures build reads the shingle
    * artifact). Only one LIVE session may own a table name at a time
    * (asserted); per-(session, name) rebuilds never happen. Freshness
    * against the INPUT is enforced upstream: every caller derives `name`
    * from [[Tables.dirKey]], which folds a content fingerprint of the
    * input dir's listing into the key — a dir rewritten mid-session
    * yields a new name and therefore a rebuild, never a stale read
    * (ArtifactsSpec pins it). */
  def materialize(spark: SparkSession, name: String, bucketCol: String,
                  buckets: Int = 8)(build: => DataFrame): DataFrame =
    materializeWith(spark, name)(
      _.write.bucketBy(buckets, bucketCol).sortBy(bucketCol))(build)

  /** [[materialize]]'s PARTITIONED twin: persist the build
    * directory-partitioned on `partitionCol` instead of bucketed — the
    * layout for predicate-pruned scans (a filter on the partition column
    * never lists, let alone reads, the other partitions), where
    * bucketing is the layout for exchange-free joins. Same
    * once-per-(session, name) and ownership contract. */
  def materializePartitioned(spark: SparkSession, name: String,
                             partitionCol: String)
                            (build: => DataFrame): DataFrame =
    materializeWith(spark, name)(_.write.partitionBy(partitionCol))(build)

  /** [[materialize]]'s CLUSTERED twin: persist the build with whatever
    * file layout the build itself established (the caller range-
    * partitions + sorts — e.g. on a Z-value, graft.sources.ZOrderLayout)
    * as plain files whose per-file/row-group column statistics carry
    * the clustering into every later scan's min-max pruning. Same
    * once-per-(session, name) and ownership contract. */
  def materializeLaidOut(spark: SparkSession, name: String)
                        (build: => DataFrame): DataFrame =
    materializeWith(spark, name)(_.write)(build)

  private def materializeWith(spark: SparkSession, name: String)
      (writer: DataFrame => org.apache.spark.sql.DataFrameWriter[
        org.apache.spark.sql.Row])(build: => DataFrame): DataFrame = {
    built.synchronized {
      if (!builtSet(spark).contains(name)) {
        builders.get(name).flatMap(r => Option(r.get)).foreach { prev =>
          if (prev != spark && !prev.sparkContext.isStopped)
            throw new IllegalStateException(
              s"artifact table $name is owned by another live session; " +
                "two active sessions sharing one warehouse would delete " +
                "each other's files")
        }
        // the in-memory catalog resets per JVM but the warehouse dir
        // persists: clear both so saveAsTable never sees a stale
        // location. Resolution goes through the Hadoop FileSystem API so
        // non-local warehouse URIs (hdfs://, s3a://) delete correctly —
        // a java.io.File of a stripped URI silently no-ops on them.
        spark.sql(s"DROP TABLE IF EXISTS $name")
        val warehouse = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), name)
        val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(warehouse)) fs.delete(warehouse, true)
        writer(build).mode("overwrite").saveAsTable(name)
        builtSet(spark).add(name)
        builders.put(name, new java.lang.ref.WeakReference(spark))
        ()
      }
    }
    spark.table(name)
  }
}
