package graft.tools

import graft.{GraftSession, SparkEntry}

/** Per-JOB wall profile of one query invocation (dev tool, guide §1):
  * every Spark action inside a query gate is a job, and the gaps
  * between jobs are driver-side work (planning, commit-protocol fs
  * ops, manifest parsing). Bench/QTime report one number per query;
  * this tool decomposes it so the optimization target is visible —
  * "12 jobs, 3 of them re-evaluating the same aggregate" reads
  * directly off the listing.
  *
  *   SPARK_GRAFT_SF_DIR=… runMain graft.tools.JobProfile <name> [...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names from SparkEntry.queries")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-jobprofile", Some("local[32]"))
    case class Job(id: Int, desc: String, start: Long, var end: Long = -1L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Job]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty(
              "spark.job.description"))).getOrElse("")
          val j = Job(js.jobId, desc, js.time)
          jobs.put(js.jobId, j); order.add(j); ()
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.get(je.jobId)).foreach(_.end = je.time); ()
        }
      })
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      fn(spark, "/root/testdata/sf0.001").count() // codegen warmup
      org.apache.spark.graftbridge.SparkBridge
        .drainListenerBus(spark.sparkContext)
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.SparkBridge
        .drainListenerBus(spark.sparkContext)
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toSeq.sortBy(_.start)
      println(f"[jobprofile] $name: $wall%.2f s wall, ${js.size} jobs")
      var prevEnd = -1L
      var jobSum = 0.0; var gapSum = 0.0
      js.foreach { j =>
        val dur = (j.end - j.start) / 1e3
        val gap = if (prevEnd < 0) 0.0 else (j.start - prevEnd) / 1e3
        jobSum += math.max(dur, 0); gapSum += math.max(gap, 0)
        println(f"[jobprofile]   gap=$gap%7.3f s  job#${j.id}%-4d " +
          f"dur=$dur%7.3f s  ${j.desc.take(90)}")
        prevEnd = math.max(prevEnd, j.end)
      }
      println(f"[jobprofile] $name: jobs=$jobSum%.2f s, " +
        f"inter-job driver gaps=$gapSum%.2f s, wall=$wall%.2f s")
    }
    spark.stop()
  }
}
