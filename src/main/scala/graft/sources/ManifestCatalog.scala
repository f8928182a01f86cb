package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, sum}

/** MULTI-TABLE TRANSACTIONS over manifest tables — the catalog-pointer
  * pattern (the Iceberg-catalog / Delta-log shape) lifted out of
  * [[graft.operators.SuffixRefresh]] into a reusable primitive: N
  * member tables advance independently, and ONE commit of a dedicated
  * catalog table — whose rows are the (relation, version) pins of the
  * last COMPLETE transaction — publishes them all at once. Readers
  * resolve the pinned versions ([[readPinned]]), so they can never
  * pair versions from different transactions; a writer that dies
  * between a member commit and the catalog commit leaves only orphaned
  * member versions, invisible to every reader and rolled back by the
  * next [[transact]].
  *
  * Contract:
  *  - '''Racing writers: exactly one wins.''' The catalog commit
  *    targets exactly `base + 1` for the base whose pins the
  *    transaction read, so of two racing [[transact]]s the second
  *    catalog rename ABORTS loudly (ConcurrentModificationException)
  *    instead of clobbering the winner's pins with pins computed from
  *    a stale base; the loser's member commits are orphans its retry's
  *    recovery rolls back before recomputing on the winner's pins.
  *    Readers need no coordination — one catalog read pins a
  *    consistent set.
  *  - '''Recovery is content-based''': a member whose newest manifest
  *    lists different FILES than its pin carries a dead transaction's
  *    commit and is rolled back with [[ManifestTable.restore]] (zero
  *    data IO) before the new transaction computes — a merge computed
  *    over half-applied state would silently corrupt. A member whose
  *    newest version is just a restore of the pin (same files) is left
  *    alone, so recovery does not re-restore forever.
  *  - '''Vacuum floor''': vacuuming a member below its pin makes the
  *    state unrecoverable — [[transact]] fails loudly ("rebuild").
  *
  * Why it matters at 100 TB: every stateful maintenance job pairs a
  * TABLE with its derived STATE (a suffix index and its summaries, an
  * SCD2 dimension and its current snapshot, a vector index and its
  * codebook). Advancing them with two independent commits leaves a
  * window where readers pair new data with old state; this primitive
  * closes the window with one O(1) catalog rename, exactly as the
  * public formats coordinate their own multi-file metadata. */
object ManifestCatalog {

  /** A catalog instance: the catalog table's root + the member tables
    * (stable relation name → table root). */
  case class Catalog(catalogRoot: String, tables: Map[String, String]) {
    require(tables.nonEmpty, "a catalog needs at least one member table")
  }

  /** The pinned (relation → version) map of the last complete
    * transaction — ONE atomic manifest read. */
  def pins(spark: SparkSession, cat: Catalog): Map[String, Int] =
    // O(|tables|) rows by construction — bounded collect
    ManifestTable.read(spark, cat.catalogRoot)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  private def commitPins(spark: SparkSession, cat: Catalog,
                         p: Map[String, Int],
                         expectedBase: Option[Int]): Unit = {
    import spark.implicits._
    // the catalog commit targets exactly base+1 (the version whose
    // pins this transaction READ): two racing transactions both
    // recover+compute, but only the first catalog rename lands — the
    // loser aborts here instead of overwriting the winner's pins with
    // pins computed from a stale base (its member commits become
    // orphans the next transact rolls back)
    ManifestTable.overwrite(spark, cat.catalogRoot,
      p.toSeq.sortBy(_._1).toDF("rel", "version").coalesce(1),
      expectedBase = expectedBase)
    ()
  }

  /** Member `name`'s table at its PINNED version. A consumer reading
    * MULTIPLE members must call [[pins]] ONCE and resolve each member
    * from that one map (or use this single-member shortcut only for
    * one table) — two readPinned calls could straddle a concurrent
    * transaction's commit and pair versions from different
    * transactions. */
  def readPinned(spark: SparkSession, cat: Catalog,
                 name: String): DataFrame =
    readAtPins(spark, cat, pins(spark, cat), name)

  /** Resolve member `name` from an already-fetched pin map — the
    * multi-member consumer's read (one [[pins]] call, N of these). */
  def readAtPins(spark: SparkSession, cat: Catalog,
                 p: Map[String, Int], name: String): DataFrame = {
    require(p.contains(name),
      s"catalog ${cat.catalogRoot} pins no relation '$name' " +
        s"(has ${p.keys.toSeq.sorted.mkString(", ")})")
    ManifestTable.readAt(spark, cat.tables(name), p(name))
  }

  /** Roll every member whose newest manifest DIFFERS from its pin back
    * to the pin (a dead transaction's orphan); loud when a member is
    * missing or vacuumed below its pin. Returns the pins. */
  private def recover(spark: SparkSession,
                      cat: Catalog): Map[String, Int] = {
    val p = pins(spark, cat)
    cat.tables.foreach { case (name, root) =>
      val pin = p.getOrElse(name, throw new IllegalStateException(
        s"catalog ${cat.catalogRoot} pins no relation '$name'"))
      val cur = ManifestTable.currentVersion(spark, root)
      require(cur.exists(_ >= pin),
        s"catalog member $root is " +
          cur.map(c => s"behind its pin ($c < $pin) — vacuumed below " +
            "the pin").getOrElse("missing entirely") +
          "; the state is unrecoverable — rebuild it")
      if (cur.get > pin) {
        // content-based: identical file lists (e.g. the restore a
        // PREVIOUS recovery committed) need no second restore
        val (added, removed) =
          ManifestTable.changedFiles(spark, root, pin, cur.get)
        if (added.nonEmpty || removed.nonEmpty) {
          ManifestTable.restore(spark, root, pin)
          ()
        }
      }
    }
    p
  }

  /** ONE multi-table transaction: recover from any crashed predecessor,
    * hand the pinned versions to `work` — which advances the member
    * tables however it likes (append / mergeCoW / overwrite) and
    * returns the new version of EVERY member — then publish them with
    * one catalog commit. If `work` throws, the catalog is untouched
    * and the members' partial commits are orphans the next transact
    * rolls back. The FIRST transaction (no catalog yet) receives an
    * empty pin map and seeds the catalog. */
  def transact(spark: SparkSession, cat: Catalog)(
      work: Map[String, Int] => Map[String, Int]): Map[String, Int] = {
    // resolve the catalog base BEFORE reading pins/recovering: the
    // final catalog commit must land on exactly this base, or the
    // pins it publishes were computed against state another
    // transaction has since replaced (stale-base abort — the same
    // read-modify-write discipline single-table overwrite carries)
    val base = ManifestTable.currentVersion(spark, cat.catalogRoot)
    val pinned =
      if (base.isEmpty) Map.empty[String, Int]
      else recover(spark, cat)
    val next = work(pinned)
    require(next.keySet == cat.tables.keySet,
      s"transaction must pin every member table exactly: got " +
        s"${next.keys.toSeq.sorted.mkString(", ")}, need " +
        cat.tables.keys.toSeq.sorted.mkString(", "))
    commitPins(spark, cat, next, expectedBase = base.orElse(Some(0)))
    next
  }

  /** Q178: A TWO-TABLE TRANSACTIONAL PIPELINE on the generalized
    * catalog, hash-gated — the q160 SCD2 history maintained as a PAIR
    * of manifest tables ('dim' = the type-2 dimension, 'cur' = the
    * current-snapshot mirror) that must never be seen from different
    * transactions: each source commit applies as ONE [[transact]]
    * (fold the CDC delta into dim, re-mirror cur, one catalog publish),
    * with a CRASH INJECTED mid-history — a transaction that commits
    * dim and dies before the catalog pointer — whose orphan the next
    * transact rolls back ([[ManifestTable.restore]], content-compared
    * so recovery never re-restores forever). The final dim is q160's
    * oracle VERBATIM (one oracle, THREE maintenance paths now:
    * in-memory fold q160, durable tail q161, catalog transaction
    * q178 — the shared-gate discipline), and the gate also asserts
    * cur ≡ the source's newest snapshot. */
  def q178CatalogTxnScd2(spark: SparkSession, sfDir: String): DataFrame = {
    val root = ManifestTable.buildScd2DemoTable(spark, sfDir,
      "manifest_cattxn_")
    val base = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_cattxn_state_" +
        graft.Tables.dirKey(spark, sfDir)).toString
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(base)))
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val cat = Catalog(s"$base/catalog",
      Map("dim" -> s"$base/dim", "cur" -> s"$base/cur"))
    // seed transaction: dim from v1, cur mirrors v1
    transact(spark, cat) { _ =>
      val v1 = ManifestTable.readAt(spark, root, 1)
      Map(
        "dim" -> ManifestTable.overwrite(spark, cat.tables("dim"),
          ManifestTable.scd2Seed(v1)),
        "cur" -> ManifestTable.overwrite(spark, cat.tables("cur"), v1))
    }
    val latest = ManifestTable.currentVersion(spark, root).get
    def applyCommit(v: Int, crashBeforeCatalog: Boolean): Unit = {
      val r = scala.util.Try(transact(spark, cat) { pinned =>
        val folded = ManifestTable.scd2Step(
          ManifestTable.readAt(spark, cat.tables("dim"), pinned("dim")),
          graft.operators.CurationPipeline.cdcDocDelta(
            spark, root, v - 1, v), v)
        val vDim = ManifestTable.overwrite(spark, cat.tables("dim"),
          folded)
        if (crashBeforeCatalog)
          throw new IllegalStateException(
            "injected crash between member commit and catalog commit")
        Map("dim" -> vDim,
          "cur" -> ManifestTable.overwrite(spark, cat.tables("cur"),
            ManifestTable.readAt(spark, root, v)))
      })
      require(r.isSuccess != crashBeforeCatalog,
        s"crash injection at source v$v did not behave: $r")
    }
    for (v <- 2 to latest) {
      // the crashed attempt leaves dim's orphan; the retry must roll
      // it back and land the SAME transaction
      if (v == 2) applyCommit(v, crashBeforeCatalog = true)
      applyCommit(v, crashBeforeCatalog = false)
    }
    // cur is exactly the source's newest snapshot — ONE pins read
    // resolves both members (the multi-member consumer discipline)
    val p = pins(spark, cat)
    val src = ManifestTable.read(spark, root)
    val cur = readAtPins(spark, cat, p, "cur")
    // ONE multiset-equality probe (signed per-row counts) instead of
    // the prior four count jobs; strictly stronger — empty exactly
    // when cur equals src as a multiset
    val drift = src.withColumn("_s", lit(1L))
      .unionByName(cur.withColumn("_s", lit(-1L)))
      .groupBy(src.columns.map(col).toSeq: _*)
      .agg(sum(col("_s")).as("_d"))
      .where(col("_d") =!= 0).take(1)
    require(drift.isEmpty,
      "the mirror member drifted from the source")
    ManifestTable.presentScd2(readAtPins(spark, cat, p, "dim"))
  }
}
