package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** zstd LEVEL sweep (CodecSweep picked the codec in r14; this probes
  * the level knob, `parquet.compression.codec.zstd.level`, default 3):
  * the lifecycle gates are write-bound, so if level 1 writes
  * materially faster at near-equal bytes it is a global win — and if
  * the bytes grow, the r14 rule ("at 100 TB the byte count IS the scan
  * time") says keep 3. Run: runMain graft.tools.ZstdLevelSweep [dir]
  */
object ZstdLevelSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-zstd-sweep", Some("local[16]"))
    val out = java.nio.file.Files.createTempDirectory("graft-zstd").toString
    def sizeOf(p: String): Long = {
      val d = new java.io.File(p)
      Option(d.listFiles).toSeq.flatten.filter(_.isFile).map(_.length).sum
    }
    def minOf3(body: => Unit): Double =
      (1 to 3).map { _ =>
        val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
      }.min
    for (table <- Seq("events", "documents", "lineitem");
         level <- Seq(1, 3, 6)) {
      spark.sparkContext.hadoopConfiguration
        .setInt("parquet.compression.codec.zstd.level", level)
      val src = table match {
        case "events" => Tables.events(spark, dir)
        case "documents" => Tables.documents(spark, dir)
        case _ => Tables.lineitem(spark, dir)
      }
      val path = s"$out/${table}_$level"
      val wall = minOf3 {
        src.write.mode("overwrite").parquet(path)
      }
      val scan = minOf3 {
        spark.read.parquet(path).agg(count(lit(1))).collect(); ()
      }
      println(f"[zstdlvl] $table%-10s L$level%d ${sizeOf(path) / 1e6}%7.1f MB " +
        f"write $wall%6.2f s  scan $scan%5.2f s")
    }
    GraftSession.deleteRecursively(new java.io.File(out))
    spark.stop()
  }
}
