package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Parquet codec/encoding sweep — the storage lever that multiplies
  * everything else at 100 TB: bytes on disk set scan time, shuffle
  * spill, and replication cost. Writes the events and documents tables
  * under each codec, reports size + write wall + a cold-ish scan-agg
  * wall (min-of-3). Run:
  * `sbt "runMain graft.tools.CodecSweep [sfDir]"`. */
object CodecSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.create("graft-codec-sweep", Some("local[16]"))
    val out = java.nio.file.Files.createTempDirectory("graft-codec").toString
    def sizeOf(p: String): Long = {
      val d = new java.io.File(p)
      Option(d.listFiles).toSeq.flatten.filter(_.isFile).map(_.length).sum
    }
    def minOf3(body: => Unit): Double =
      (1 to 3).map { _ =>
        val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
      }.min
    println(f"[codec] ${"table"}%-10s ${"codec"}%-7s ${"MB"}%7s " +
      f"${"write s"}%8s ${"scan s"}%7s")
    for (table <- Seq("events", "documents");
         codec <- Seq("snappy", "zstd", "gzip", "lz4", "none")) {
      val src = if (table == "events") Tables.events(spark, dir)
                else Tables.documents(spark, dir)
      val path = s"$out/${table}_$codec"
      val wall = minOf3 {
        src.write.mode("overwrite")
          .option("compression", codec).parquet(path)
      }
      val scan = minOf3 {
        val df = spark.read.parquet(path)
        if (table == "events")
          df.agg(avg(unix_micros(col("ts"))), sum("value")).collect()
        else df.agg(sum(length(col("text")))).collect()
        ()
      }
      println(f"[codec] $table%-10s $codec%-7s ${sizeOf(path) / 1e6}%7.1f " +
        f"$wall%8.2f $scan%7.2f")
    }
    GraftSession.deleteRecursively(new java.io.File(out))
    spark.stop()
  }
}
