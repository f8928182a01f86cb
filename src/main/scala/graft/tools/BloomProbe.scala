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
    spark.stop()
  }
}
