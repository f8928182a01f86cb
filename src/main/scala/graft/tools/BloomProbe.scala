package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.sources.ManifestTable

/** The manifest bloom sidecar's (format v5) scale claim, measured:
  * a point lookup on a NON-clustered column should open ~1 file + the
  * 1% false-positive tail instead of every file, at a metadata cost of
  * ~1.2 bytes/row/column. Readings at the bench SF:
  *  1. files opened: bloom-pruned vs stats-only (same probe set);
  *  2. wall: pruned point lookup vs full-scan filter;
  *  3. sidecar bytes vs data bytes (the metadata tax).
  * Run: `sbt "runMain graft.tools.BloomProbe [sfDir]"`.
  * Findings land in SCALING.md §"Bloom point-lookup pruning". */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.create("graft-bloomprobe", Some("local[16]"))
    val files = 64
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_quantity")

    def build(bloom: Boolean): String = {
      val root = new Path(spark.conf.get("spark.sql.warehouse.dir"),
        s"bloomprobe_${bloom}_${Tables.dirKey(spark, dir)}").toString
      val fs = new Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
      ManifestTable.overwrite(spark, root,
        li.repartitionByRange(files, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"),
        boundsCol = Some("l_orderkey"),
        bloomCols = if (bloom) Seq("l_partkey") else Seq.empty)
      root
    }
    val rootB = build(bloom = true)
    val rootS = build(bloom = false)

    // 20 probe keys spread across the domain (deterministic)
    val probes = li.select("l_partkey").distinct()
      .orderBy("l_partkey").collect().map(_.getLong(0))
    val picked = (0 until 20).map(i =>
      probes((i.toLong * probes.length / 20).toInt))

    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    var (openedB, openedS) = (0L, 0L)
    val (_, wallB) = timeIt { picked.foreach { k =>
      val df = ManifestTable.readWherePointEquals(spark, rootB,
        "l_partkey", k)
      openedB += df.inputFiles.length; df.count() } }
    val (_, wallS) = timeIt { picked.foreach { k =>
      val df = ManifestTable.readWherePointEquals(spark, rootS,
        "l_partkey", k)
      openedS += df.inputFiles.length; df.count() } }
    val fs = new Path(rootB)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bytes(glob: String): Long =
      fs.globStatus(new Path(rootB, glob)).map(_.getLen).sum
    val sidecarBytes = bytes("data/*/_bloom.*")
    val dataBytes = bytes("data/*/part-*")
    println(f"[bloomprobe] sf=$dir files=$files probes=${picked.size}")
    println(f"[bloomprobe] filesOpened bloom=$openedB statsOnly=$openedS" +
      f" (${openedB.toDouble / openedS * 100}%.1f%%)")
    println(f"[bloomprobe] wall bloom=$wallB%.2fs statsOnly=$wallS%.2fs")
    println(f"[bloomprobe] sidecar=${sidecarBytes / 1024}KiB " +
      f"data=${dataBytes / 1024}KiB " +
      f"(${sidecarBytes.toDouble / dataBytes * 100}%.2f%% tax, " +
      f"${sidecarBytes * 8.0 / li.count()}%.2f bits/row)")

    // ---- append-heavy history: the sidecar-per-commit-dir lifecycle.
    // One sidecar per commit dir per column means a point lookup on an
    // N-append table opens O(N) sidecar files (stats keep every file on
    // a scattered column, so every commit dir's sidecar is consulted);
    // OPTIMIZE consolidates to one dir. Measure the curve: lookups at
    // 4/8/16 commits, then post-optimize.
    val commits = 16
    val rootH = new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"bloomprobe_hist_${Tables.dirKey(spark, dir)}").toString
    val fsH = new Path(rootH)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsH.exists(new Path(rootH))) fsH.delete(new Path(rootH), true)
    def sliceH(i: Int) = li.where(pmod(col("l_orderkey"),
      lit(commits)) === i)
    ManifestTable.overwrite(spark, rootH, sliceH(0),
      boundsCol = Some("l_orderkey"), bloomCols = Seq("l_partkey"))
    val lookKeys = picked.take(8)
    def sidecars(): Int =
      Option(fsH.globStatus(new Path(rootH, "data/*/_bloom.*")))
        .map(_.length).getOrElse(0)
    def lookupWall(): Double = timeIt { lookKeys.foreach { k =>
      ManifestTable.readWherePointEquals(spark, rootH,
        "l_partkey", k).count() } }._2
    var i = 1
    for (checkpoint <- Seq(4, 8, 16)) {
      while (i < checkpoint) {
        // append auto-stamps the table's declared bloom columns — the
        // maintained-index contract
        ManifestTable.append(spark, rootH, sliceH(i)); i += 1
      }
      println(f"[bloomprobe] history commits=$checkpoint " +
        f"sidecarFiles=${sidecars()} lookupWall=${lookupWall()}%.2fs " +
        f"(8 probes)")
    }
    val (_, filesBefore, filesAfter) =
      ManifestTable.optimize(spark, rootH, "l_orderkey", 8)
    println(f"[bloomprobe] history post-optimize " +
      f"sidecarFiles=${sidecars()} lookupWall=${lookupWall()}%.2fs " +
      f"(files $filesBefore -> $filesAfter; a lookup now consults ONE " +
      "live sidecar — the old dirs' await vacuum)")
    ManifestTable.vacuum(spark, rootH, retain = 1, orphanRetentionMs = 0L)
    println(f"[bloomprobe] history post-vacuum " +
      f"sidecarFiles=${sidecars()} lookupWall=${lookupWall()}%.2fs")
    spark.stop()
  }
}
