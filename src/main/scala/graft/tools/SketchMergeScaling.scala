package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.RelationalQueries

/** q141's scale claim, measured: sliding-window quantiles from MERGED
  * daily sketches vs re-aggregating every window's RAW rows. The wall
  * numbers at test SF sit below the crossover (tiny corpus, two
  * aggregation levels vs one trivial join) — the structural signal is
  * the shuffle volume feeding the window merge: ≤ |days|·k kept pairs
  * versus ~7× the corpus, linear in N. Run:
  * `sbt "runMain graft.tools.SketchMergeScaling [sfDir]"`. */
object SketchMergeScaling {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.create("graft-sketch-merge", Some("local[16]"))
    val records = new java.util.concurrent.atomic.AtomicLong
    val bytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
            bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            ()
          }
        }
      })
    def measure(tag: String)(body: => Unit): Unit = {
      org.apache.spark.graftbridge.SparkBridge
        .drainListenerBus(spark.sparkContext)
      val (r0, b0, t0) = (records.get, bytes.get, System.nanoTime)
      body
      org.apache.spark.graftbridge.SparkBridge
        .drainListenerBus(spark.sparkContext)
      println(f"[sketchmerge] $tag: ${(System.nanoTime - t0) / 1e9}%.2f s  " +
        f"${records.get - r0}%,d shuffle records  " +
        f"${(bytes.get - b0) / 1e6}%.3f MB")
    }
    def base = Tables.events(spark, dir)
      .where(col("ts").isNotNull && col("value").isNotNull)
      .select(to_date(col("ts")).as("day"),
        conv(substring(md5(col("event_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"),
        round(col("value") * 100).cast("long").as("v"))
    val nDays = base.select("day").distinct().count()
    println(s"[sketchmerge] dir=$dir events=${base.count()} days=$nDays " +
      s"keptPairs<=${nDays * 256}")
    for (pass <- 1 to 3) {
      measure(s"merged-sketches pass $pass") {
        RelationalQueries.q141SlidingQuantiles(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      measure(s"naive-rescan    pass $pass") {
        val windows = base.select(col("day").as("window_end")).distinct()
        windows.join(base,
            col("day").between(date_sub(col("window_end"), 6),
              col("window_end")))
          .groupBy("window_end")
          .agg(graft.functions.QuantileSketchAgg
            .sketch(col("h"), col("v"), 256).as("sample"))
          .select(col("window_end"),
            explode(typedLit(Seq(50, 95))).as("pct"), col("sample"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
