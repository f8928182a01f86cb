package graft.tools

import graft.{GraftSession, SparkEntry}

/** Time individual SparkEntry queries by name (dev tool) — the focused
  * twin of Bench for plan iteration: warms each query at sf0.001, then
  * reports min-of-3 seconds and shuffle-write MB at the target dir
  * without paying the full 90-query suite.
  *
  *   SPARK_GRAFT_SF_DIR=… runMain graft.tools.QTime <name> [<name> …]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names from SparkEntry.queries")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-qtime", Some("local[32]"))
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null)
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      })
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      fn(spark, "/root/testdata/sf0.001").count() // codegen warmup
      val runs = (1 to 3).map { _ =>
        org.apache.spark.graftbridge.SparkBridge
          .drainListenerBus(spark.sparkContext)
        val b0 = shuffleBytes.get()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graftbridge.SparkBridge
          .drainListenerBus(spark.sparkContext)
        (dt, (shuffleBytes.get() - b0) / 1e6)
      }
      val best = runs.minBy(_._1)
      println(f"[qtime] $name%-28s ${best._1}%6.2f s  ${best._2}%7.2f MB shuffle  (spreads ${runs.map(r => f"${r._1}%.2f").mkString("/")})")
      // QTIME_EXPLAIN=1: executed plan + how many times the corpus is
      // scanned/exploded (double-evaluated subtrees are invisible in
      // wall time until the corpus is big)
      if (sys.env.get("QTIME_EXPLAIN").contains("1")) {
        val df = fn(spark, sfDir)
        df.count()
        val plan = df.queryExecution.executedPlan.toString
        val scans = "Scan parquet".r.findAllIn(plan).length
        val gens = "Generate".r.findAllIn(plan).length
        println(s"[qtime] $name: $scans parquet scans, $gens generates")
        println(plan.take(6000))
      }
    }
    spark.stop()
  }
}
