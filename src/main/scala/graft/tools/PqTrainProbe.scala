package graft.tools

import graft.GraftSession

/** Wall vs job-time decomposition of PQ model training (guide §1 /
  * §7.3: a slow step with idle executors is driver work — planning,
  * codegen, literal conversion). Run:
  *   runMain graft.tools.PqTrainProbe [<sfDir>]
  */
object PqTrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-pqtrain", Some("local[32]"))
    val jobMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, Long]
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(js.jobId, js.time); ()
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(je.jobId))
            .foreach(s => jobMs.addAndGet(je.time - s))
          ()
        }
      })
    // coarse codebook first so its cost doesn't land on the PQ numbers
    graft.operators.SimilarityQueries.kmeansCodebook(spark, sfDir)
    org.apache.spark.graftbridge.SparkBridge
      .drainListenerBus(spark.sparkContext)
    jobMs.set(0)
    val t0 = System.nanoTime()
    graft.operators.ProductQuantization.pqModelAt(spark, sfDir,
      graft.operators.ProductQuantization.M256,
      graft.operators.ProductQuantization.K256)
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graftbridge.SparkBridge
      .drainListenerBus(spark.sparkContext)
    println(f"[pqtrain] M256/K256 wall $wall%.2f s, job time ${jobMs.get / 1e3}%.2f s, driver ${wall - jobMs.get / 1e3}%.2f s")
    spark.stop()
  }
}
