package graft.metrics

import graft.{SparkSpec, Tables}

class MetricsReportSpec extends SparkSpec {

  /** The listener bus is async; wait until task events have drained. */
  private def awaitTasks(m: MetricsReport): Unit = {
    val deadline = System.nanoTime() + 10000000000L
    while (m.tasksSeen == 0 && System.nanoTime() < deadline) Thread.sleep(50)
  }

  test("listener collects job/task/shuffle counters and renders stably") {
    val m = MetricsReport.install(spark)
    // run a job with a real shuffle so the exchange counters move
    Tables.orders(spark, sfDir).groupBy("o_orderstatus").count().collect()
    awaitTasks(m)
    val r = m.report()
    assert(r.startsWith("GRAFT METRICS REPORT"))
    // fixed section order — the reference's easy-diffing contract
    val idx = Seq("== Job Configuration ==", "== Timing ==",
      "== Input / Output ==", "== Shuffle", "== Top 10 stages")
      .map(r.indexOf)
    assert(idx.forall(_ >= 0) && idx === idx.sorted, s"section order:\n$r")
    assert("jobs: (\\d+)".r.findFirstMatchIn(r).get.group(1).toInt >= 1)
    assert("tasks: (\\d+)".r.findFirstMatchIn(r).get.group(1).toInt > 0)
  }

  test("failed tasks are detected by reason type, not string rendering") {
    import org.apache.spark.scheduler.{SparkListenerTaskEnd, TaskInfo, TaskLocality}
    val m = new MetricsReport
    def event(reason: org.apache.spark.TaskEndReason): SparkListenerTaskEnd =
      SparkListenerTaskEnd(0, 0, "ResultTask", reason,
        new TaskInfo(0L, 0, 0, 0, 0L, "driver", "localhost",
          TaskLocality.PROCESS_LOCAL, false),
        null, null)
    m.onTaskEnd(event(org.apache.spark.Success))
    m.onTaskEnd(event(org.apache.spark.TaskKilled("synthetic", Seq.empty,
      Seq.empty, Seq.empty)))
    m.onTaskEnd(event(org.apache.spark.UnknownReason))
    val r = m.report()
    assert(r.contains("tasks: 3 (failed 2)"), s"report:\n$r")
  }

  test("report writes to disk") {
    val m = MetricsReport.install(spark)
    Tables.nation(spark, sfDir).count()
    awaitTasks(m)
    val path = java.nio.file.Files.createTempDirectory("mr").toString + "/metrics_report.txt"
    m.write(path)
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      .contains("GRAFT METRICS REPORT"))
  }
}
