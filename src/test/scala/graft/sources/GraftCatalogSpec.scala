package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The DSv2 SQL catalog over manifest tables: identifier resolution,
  * VERSION/TIMESTAMP AS OF pinning, the vacuumed-version rejection,
  * pushdown-driven manifest file skipping, and the write-op
  * rejections. */
class GraftCatalogSpec extends SparkSpec {

  private lazy val wh =
    java.nio.file.Files.createTempDirectory("graft-cat").toString

  private def docs = graft.Tables.documents(spark, sfDir)
    .select("doc_id", "lang", "text")

  private def mkTable(db: String, t: String): String = {
    val root = new Path(new Path(wh, db), t).toString
    ManifestTable.overwrite(spark, root,
      docs.where(col("doc_id") % 3 === 0)
        .repartitionByRange(4, col("doc_id"))
        .sortWithinPartitions("doc_id"),
      boundsCol = Some("doc_id"))
    ManifestTable.append(spark, root,
      docs.where(col("doc_id") % 3 =!= 0), boundsCol = Some("doc_id"))
    root
  }

  private def registered(): Unit =
    GraftCatalog.register(spark, "gcat", wh)

  test("SQL reads resolve the newest version; VERSION AS OF pins " +
      "each commit; TIMESTAMP AS OF resolves by monotonized instant") {
    val root = mkTable("db1", "docs")
    registered()
    val t = "gcat.db1.docs"
    assert(spark.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0)
      === docs.count())
    assert(spark.sql(s"SELECT count(*) AS n FROM $t VERSION AS OF 1")
      .head().getLong(0) === docs.where(col("doc_id") % 3 === 0).count())
    // TIMESTAMP AS OF end to end through SQL: each version's own
    // (monotonized) instant resolves to exactly that version
    val h = ManifestTable.history(spark, root)
    val tz = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    def sqlTs(ms: Long): String =
      java.time.Instant.ofEpochMilli(ms).atZone(tz).toLocalDateTime
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    h.foreach { c =>
      assert(spark.sql(s"SELECT count(*) AS n FROM $t " +
        s"TIMESTAMP AS OF '${sqlTs(c.timestampMs)}'").head().getLong(0)
        === ManifestTable.readAt(spark, root, c.version).count(),
        s"TIMESTAMP AS OF at v${c.version}'s instant resolved wrong")
    }
    // a pre-history instant fails loudly
    val ex = intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM $t " +
        s"TIMESTAMP AS OF '${sqlTs(h.head.timestampMs - 1)}'").collect()
    }
    assert(ex.getMessage.contains("predates"))
  }

  test("a vacuumed version fails loudly at analysis; an unknown table " +
      "raises NoSuchTableException; DROP TABLE drops; ALTER/RENAME " +
      "are rejected") {
    val root = mkTable("db2", "docs")
    registered()
    ManifestTable.vacuum(spark, root, retain = 1, orphanRetentionMs = 0L)
    val exV = intercept[Exception] {
      spark.sql("SELECT count(*) FROM gcat.db2.docs VERSION AS OF 1")
        .collect()
    }
    assert(exV.getMessage.contains("vacuumed"),
      s"vacuumed version error not loud: ${exV.getMessage}")
    val exT = intercept[Exception] {
      spark.sql("SELECT * FROM gcat.db2.nope").collect()
    }
    assert(exT.getMessage.toLowerCase.contains("table"))
    // catalog ops
    assert(spark.sql("SHOW TABLES IN gcat.db2").collect()
      .map(_.getString(1)).contains("docs"))
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.db2.docs ADD COLUMN x INT").collect()
    }
    spark.sql("DROP TABLE gcat.db2.docs")
    assert(!new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration).exists(new Path(root)))
  }

  test("pushed filters skip files from the manifest (never wrongly) " +
      "and survive on non-stats columns; projection prunes columns") {
    val root = mkTable("db3", "docs")
    registered()
    val total = ManifestTable.snapshot(spark, root).files.size
    val probe = docs.agg(min("doc_id")).head().getLong(0)
    // the scan the SQL path builds, checked directly: a tight range on
    // the bounds column keeps fewer files than the table lists
    val kept = GraftCatalogScan.dataFrame(spark, root, None,
      Seq("doc_id"), Seq(org.apache.spark.sql.sources.EqualTo(
        "doc_id", probe)), docs.schema).inputFiles.length
    assert(kept < total, s"no file skipping: $kept of $total")
    // end to end through SQL: correct rows under the same predicate
    assert(spark.sql(
      s"SELECT count(*) AS n FROM gcat.db3.docs WHERE doc_id = $probe")
      .head().getLong(0) === docs.where(col("doc_id") === probe).count())
    // a filter on a column WITHOUT stored stats must not prune (and
    // must still answer correctly via the residual + post-scan filter)
    assert(spark.sql(
      "SELECT count(*) AS n FROM gcat.db3.docs WHERE lang = 'en'")
      .head().getLong(0) === docs.where(col("lang") === "en").count())
    // unsatisfiable range: empty result, not an error
    assert(spark.sql(
      s"SELECT count(*) AS n FROM gcat.db3.docs " +
        s"WHERE doc_id = $probe AND doc_id = ${probe + 1}")
      .head().getLong(0) === 0L)
    // outstanding equality deletes are applied on the SQL path
    ManifestTable.deleteWhereKeyIn(spark, root, "doc_id",
      docs.where(col("doc_id") % 7 === 0).select("doc_id"))
    assert(spark.sql("SELECT count(*) AS n FROM gcat.db3.docs")
      .head().getLong(0) === docs.where(col("doc_id") % 7 =!= 0).count())
  }

  test("SQL writes ride the commit protocol: INSERT INTO appends " +
      "atomically, INSERT OVERWRITE truncates, constraints and the " +
      "pinned-table rejection hold under SQL") {
    registered()
    val fs = new Path(wh).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(wh, "db4"), true)
    fs.mkdirs(new Path(wh, "db4"))
    docs.select("doc_id", "lang").createOrReplaceTempView("gcat_docs")
    spark.sql("CREATE TABLE gcat.db4.t (doc_id BIGINT, lang STRING)")
    // CREATE over an existing table is rejected
    intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db4.t (x INT)")
    }
    spark.sql("INSERT INTO gcat.db4.t SELECT doc_id, lang FROM " +
      "gcat_docs WHERE doc_id % 2 = 0")
    val root = new Path(new Path(wh, "db4"), "t").toString
    assert(ManifestTable.currentVersion(spark, root) === Some(2))
    // a CHECK constraint declared on the Scala side gates SQL inserts
    ManifestTable.addConstraint(spark, root, "pos_id", "doc_id >= 0")
    val exC = intercept[Exception] {
      spark.sql("INSERT INTO gcat.db4.t VALUES (-1, 'xx')")
    }
    assert(exC.getMessage.contains("pos_id") ||
      Option(exC.getCause).exists(_.getMessage.contains("pos_id")),
      s"SQL insert bypassed the constraint: ${exC.getMessage}")
    spark.sql("INSERT INTO gcat.db4.t SELECT doc_id, lang FROM " +
      "gcat_docs WHERE doc_id % 2 = 1")
    assert(spark.sql("SELECT count(*) AS n FROM gcat.db4.t")
      .head().getLong(0) === docs.count())
    // truncating overwrite
    spark.sql("INSERT OVERWRITE gcat.db4.t SELECT doc_id, lang FROM " +
      "gcat_docs WHERE doc_id % 3 = 0")
    assert(spark.sql("SELECT count(*) AS n FROM gcat.db4.t")
      .head().getLong(0) === docs.where(col("doc_id") % 3 === 0).count())
    // a time-travel-pinned relation rejects writes
    val exP = intercept[Exception] {
      spark.sql("INSERT INTO gcat.db4.t VERSION AS OF 2 VALUES (1, 'x')")
    }
    assert(exP.getMessage.nonEmpty)
    // partition transforms are rejected loudly
    val exT = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db4.t2 (a INT) PARTITIONED BY (a)")
    }
    assert(exT.getMessage.contains("partition transforms") ||
      Option(exT.getCause).exists(
        _.getMessage.contains("partition transforms")))
  }

  test("SQL DELETE FROM: translatable predicates delete exactly the " +
      "matching rows; untranslatable ones are rejected at analysis") {
    val root = mkTable("db6", "docs")
    registered()
    spark.sql("DELETE FROM gcat.db6.docs WHERE doc_id % 5 = 0")
    assert(spark.sql("SELECT count(*) AS n FROM gcat.db6.docs")
      .head().getLong(0) === docs.where(col("doc_id") % 5 =!= 0).count())
    assert(ManifestTable.currentVersion(spark, root) === Some(3))
    // an untranslatable predicate (subquery) must NOT silently delete
    val before = spark.sql("SELECT count(*) AS n FROM gcat.db6.docs")
      .head().getLong(0)
    intercept[Exception] {
      spark.sql("DELETE FROM gcat.db6.docs WHERE doc_id IN " +
        "(SELECT doc_id FROM gcat.db6.docs LIMIT 1)")
    }
    assert(spark.sql("SELECT count(*) AS n FROM gcat.db6.docs")
      .head().getLong(0) === before,
      "a rejected DELETE changed the table")
  }

  test("metadata tables: db.t.history serves per-version metadata, " +
      "db.t.files the per-file stats; a data table wins the name") {
    val root = mkTable("db5", "docs")
    registered()
    val h = spark.sql(
      "SELECT version, data_files, delete_files, n_rows " +
        "FROM gcat.db5.docs.history ORDER BY version").collect()
    assert(h.map(_.getInt(0)).toSeq === Seq(1, 2))
    assert(h.last.getLong(3) === docs.count())
    val f = spark.sql(
      "SELECT file, n_rows, bytes, lo, hi FROM gcat.db5.docs.files")
      .collect()
    assert(f.length === ManifestTable.snapshot(spark, root).files.size)
    assert(f.map(_.getLong(1)).sum === docs.count())
    assert(f.forall(r => r.getLong(2) > 0 && !r.isNullAt(3)),
      "files metadata lost bytes or bounds")
    // a REAL table named 'history' shadows the metadata suffix
    mkTable("db5/docs2", "history")
    assert(spark.sql("SELECT count(*) AS n FROM " +
      "gcat.db5.docs2.history").head().getLong(0) === docs.count())
  }

  test("procedures: CALL system.optimize compacts behind one commit " +
      "with diagnostics; unknown procedures fail loudly") {
    val root = mkTable("db7", "docs")
    registered()
    val before = ManifestTable.snapshot(spark, root).files.size
    val r = spark.sql("CALL gcat.system.optimize(" +
      "table => 'db7.docs', cluster_col => 'doc_id', " +
      "target_files => 2)").head()
    assert(r.getInt(0) === 3 && r.getInt(1) === before &&
      r.getInt(2) === 2)
    assert(ManifestTable.read(spark, root).count() === docs.count(),
      "CALL optimize changed rows")
    intercept[Exception] {
      spark.sql("CALL gcat.system.nope(table => 'db7.docs')").collect()
    }
  }

  test("2-D pruning through SQL: after optimizeZOrder, pushed range " +
      "filters on BOTH dimensions keep strictly fewer files than " +
      "either alone") {
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThanOrEqual}
    val b = java.nio.file.Files.createTempDirectory("graft-zcat").toString
    val root = s"$b/ev"
    val ev = graft.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "value")
      .where(col("user_id").isNotNull && col("ts").isNotNull)
    ManifestTable.overwrite(spark, root, ev)
    ManifestTable.optimizeZOrder(spark, root, "user_id", "ts", 64)
    val mm = ev.agg(max("user_id"), min(unix_micros(col("ts"))),
      max(unix_micros(col("ts")))).head()
    val (uHi, tLo, tHi) = (mm.getLong(0) / 10,
      mm.getLong(1) + (mm.getLong(2) - mm.getLong(1)) / 4,
      mm.getLong(1) + (mm.getLong(2) - mm.getLong(1)) * 3 / 4)
    def kept(filters: Seq[org.apache.spark.sql.sources.Filter]): Int =
      GraftCatalogScan.dataFrame(spark, root, None, Seq("event_id"),
        filters, ev.schema).inputFiles.length
    def tsOf(us: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000L))
    val uF = Seq(GreaterThanOrEqual("user_id", 0L),
      LessThanOrEqual("user_id", uHi))
    val tF = Seq(GreaterThanOrEqual("ts", tsOf(tLo)),
      LessThanOrEqual("ts", tsOf(tHi)))
    val total = ManifestTable.snapshot(spark, root).files.size
    val (kU, kT, kUT) = (kept(uF), kept(tF), kept(uF ++ tF))
    assert(kU < total && kT < total,
      s"single-dimension SQL pruning failed: $kU/$kT of $total")
    assert(kUT < kU && kUT < kT,
      s"2-D SQL pruning no better than 1-D: $kUT vs $kU/$kT")
    // correctness on the pruned set: SQL count == direct count
    GraftCatalog.register(spark, "gcat", wh) // any catalog works; probe
    assert(GraftCatalogScan.dataFrame(spark, root, None,
      Seq("event_id"), uF ++ tF, ev.schema).count() ===
      ev.where(col("user_id") <= uHi &&
        unix_micros(col("ts")).between(tLo, tHi)).count())
  }

  test("range translation: conjunctions intersect, In spans, " +
      "non-integral columns never constrain") {
    import org.apache.spark.sql.sources._
    val schema = docs.schema
    val r = GraftCatalogScan.rangesOf(Seq(
      GreaterThanOrEqual("doc_id", 10L), LessThan("doc_id", 20L),
      EqualTo("lang", "en"), IsNotNull("doc_id")), schema)
    assert(r === Map("doc_id" -> ((10L, 19L))))
    val rIn = GraftCatalogScan.rangesOf(Seq(
      In("doc_id", Array(5L, 1L, 9L))), schema)
    assert(rIn === Map("doc_id" -> ((1L, 9L))))
    // residual translation keeps conjunctions and Or/Not shapes
    val res = GraftCatalogScan.residualOf(Seq(
      Or(EqualTo("doc_id", 1L), EqualTo("doc_id", 2L)),
      Not(IsNull("lang"))))
    assert(res.isDefined)
  }
}
