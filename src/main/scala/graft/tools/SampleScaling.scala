package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.CurationPipeline

/** q127 A/B: the bisected exact-count stratified sample vs its
  * rank-window twin, as listener-measured wall / shuffle records /
  * shuffle bytes over a scale dir.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.SampleScaling"
  *
  * The claim under test (q127's scaladoc): the window formulation
  * moves EVERY corpus row through its per-stratum sort exchange, while
  * the bisect path's exchanges carry only histogram partials, two tiny
  * count aggregates, and threshold ties — so its shuffle volume is
  * O(strata · buckets · rounds), independent of corpus size. */
object SampleScaling {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.create("graft-sample-scaling", Some("local[16]"))
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
      println(f"[sample] $tag: ${(System.nanoTime - t0) / 1e9}%.2f s  " +
        f"${records.get - r0}%,d shuffle records  " +
        f"${(bytes.get - b0) / 1e6}%.3f MB")
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        CurationPipeline.exactSampleHash(col("lang"), col("doc_id"))
          .as("hv"),
        when(col("lang") === "en", lit(50)).otherwise(lit(20)).as("pct"))
    println(s"[sample] dir=$dir corpus=${docs.count()} docs")
    // min-of-3 per side, alternating so a load spike can't bias one side
    for (pass <- 1 to 3) {
      measure(s"bisect pass $pass") {
        CurationPipeline.exactStratifiedSample(docs)
          .write.format("noop").mode("overwrite").save()
      }
      measure(s"window pass $pass") {
        CurationPipeline.exactSampleByWindow(docs)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
