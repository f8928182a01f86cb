package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.sources.{GraftCatalog, ManifestTable}

/** What does the SQL catalog's V1Scan bridge COST over the direct
  * Scala read? The bridge's only structural tax is the external-Row
  * round-trip at the scan boundary (`RowDataSourceScanExec` converts
  * Row → InternalRow instead of running the parquet scan inside
  * whole-stage codegen). Measure both paths on the same table, full
  * scan and pruned range, plus the file-skipping parity.
  * Run: `sbt "runMain graft.tools.CatalogProbe [sfDir]"`.
  * Findings land in SCALING.md §"SQL catalog bridge tax". */
object CatalogProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.create("graft-catprobe", Some("local[32]"))
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val db = s"catprobe_${Tables.dirKey(spark, dir)}"
    val dbPath = new Path(wh, db)
    val fs = dbPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dbPath)) fs.delete(dbPath, true)
    val root = new Path(dbPath, "li").toString
    val li = Tables.lineitem(spark, dir)
    ManifestTable.overwrite(spark, root,
      li.repartitionByRange(32, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey"),
      boundsCol = Some("l_orderkey"))
    GraftCatalog.register(spark, "gprobe", wh)
    val t = s"gprobe.`$db`.`li`"
    val mm = li.agg(min("l_orderkey"), max("l_orderkey")).head()
    val (lo, hi) = (mm.getLong(0),
      mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 10)

    def timed(label: String)(f: => Long): Unit = {
      f // warm
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[catprobe] $label min=${samples.min}%.2f s " +
        f"(${samples.map(s => f"$s%.2f").mkString(",")})")
    }
    // full-scan aggregate: the worst case for the bridge (every row
    // crosses the Row boundary)
    timed("full_scan_scala")(ManifestTable.read(spark, root)
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")))
      .head().getLong(0))
    timed("full_scan_sql")(spark.sql(
      s"SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS s " +
        s"FROM $t").head().getLong(0))
    // pruned range: file skipping should dominate; the bridge tax
    // shrinks with the row count
    timed("range_scala")(ManifestTable.readWhereKeyBetween(spark, root,
      "l_orderkey", lo, hi)
      .agg(count(lit(1))).head().getLong(0))
    timed("range_sql")(spark.sql(
      s"SELECT count(*) AS n FROM $t " +
        s"WHERE l_orderkey BETWEEN $lo AND $hi").head().getLong(0))
    // ROW-SIZED OUTPUTS (round-18 ask): aggregate-shaped queries hide
    // the Row round-trip behind a 1-row result; a SELECT *-shaped read
    // pays it on EVERY output row AND materializes them — the honest
    // worst case for the V1 bridge. The noop sink forces full
    // materialization without a driver collect.
    def drain(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    timed("select_star_scala")(drain(ManifestTable.read(spark, root)))
    timed("select_star_sql")(drain(spark.sql(s"SELECT * FROM $t")))
    // the 2-column projection: column pruning reaches the parquet scan
    // on both paths; the bridge converts narrower Rows
    timed("project2_scala")(drain(ManifestTable.read(spark, root)
      .select(col("l_orderkey"), col("l_extendedprice"))))
    timed("project2_sql")(drain(spark.sql(
      s"SELECT l_orderkey, l_extendedprice FROM $t")))
    // pruned row-sized read: file skipping bounds the converted rows
    timed("range_rows_scala")(drain(ManifestTable.readWhereKeyBetween(
      spark, root, "l_orderkey", lo, hi)))
    timed("range_rows_sql")(drain(spark.sql(
      s"SELECT * FROM $t WHERE l_orderkey BETWEEN $lo AND $hi")))
    // pruning parity: both paths must open the same file subset
    val filesScala = ManifestTable.readWhereKeyBetween(spark, root,
      "l_orderkey", lo, hi).inputFiles.length
    val filesSql = graft.sources.GraftCatalogScan.dataFrame(spark, root,
      None, Seq("l_orderkey"),
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual(
        "l_orderkey", lo),
        org.apache.spark.sql.sources.LessThanOrEqual("l_orderkey", hi)),
      li.schema).inputFiles.length
    val total = ManifestTable.snapshot(spark, root).files.size
    println(s"[catprobe] pruning: scala=$filesScala sql=$filesSql " +
      s"of $total files")
    spark.stop()
  }
}
