package graft.metrics

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** The reference engine's always-on metrics subsystem (reference
  * metrics.c:107-526) re-expressed as a SparkListener.
  *
  * The reference records per-phase wall times, emit/flush counters, queue
  * waits, lock contention, and per-partition key skew, then prints a
  * stable-ordered text report "for easy diffing" (reference README.md:417).
  * On Spark the equivalents are stage/task metrics: shuffle bytes/records
  * (the flush/exchange analog), task run times per stage (phase times),
  * and per-task skew (the reference's per-partition σ, metrics.c:365-421).
  * Locks and queue depths have no analog — tasks are shared-nothing.
  *
  * Always-on and cheap: counters are LongAdders fed by the listener bus;
  * `report()` renders sections in a fixed order so successive runs diff
  * cleanly, exactly like the reference's report file.
  */
final class MetricsReport extends SparkListener {

  private val jobs = new AtomicLong
  private val tasks = new AtomicLong
  private val failedTasks = new AtomicLong
  private val cpuTimeNs = new LongAdder
  private val runTimeMs = new LongAdder
  private val gcTimeMs = new LongAdder
  private val shuffleReadBytes = new LongAdder
  private val shuffleReadRecords = new LongAdder
  private val shuffleWriteBytes = new LongAdder
  private val shuffleWriteRecords = new LongAdder
  private val spillBytes = new LongAdder
  private val inputBytes = new LongAdder
  private val inputRecords = new LongAdder
  private val outputRecords = new LongAdder
  /** stage id → (name, numTasks, runtimeMs) per completed stage. */
  private val stages =
    new ConcurrentHashMap[Int, (String, Int, Long)]()
  /** stage id → max single-task runtime ms (fed by onTaskEnd): the skew
    * signal — a stage whose max task dwarfs its mean has a hot partition
    * (the reference's per-partition σ, metrics.c:365-421). */
  private val stageMaxTaskMs = new ConcurrentHashMap[Int, Long]()
  private val t0 = System.nanoTime()

  override def onJobStart(e: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
  override def onJobEnd(e: SparkListenerJobEnd): Unit = ()

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    tasks.incrementAndGet()
    if (e.reason != org.apache.spark.Success) { failedTasks.incrementAndGet(); () }
    val m = e.taskMetrics
    if (m != null) {
      stageMaxTaskMs.merge(e.stageId, m.executorRunTime, math.max(_, _))
      cpuTimeNs.add(m.executorCpuTime)
      runTimeMs.add(m.executorRunTime)
      gcTimeMs.add(m.jvmGCTime)
      shuffleReadBytes.add(m.shuffleReadMetrics.totalBytesRead)
      shuffleReadRecords.add(m.shuffleReadMetrics.recordsRead)
      shuffleWriteBytes.add(m.shuffleWriteMetrics.bytesWritten)
      shuffleWriteRecords.add(m.shuffleWriteMetrics.recordsWritten)
      spillBytes.add(m.diskBytesSpilled)
      inputBytes.add(m.inputMetrics.bytesRead)
      inputRecords.add(m.inputMetrics.recordsRead)
      outputRecords.add(m.outputMetrics.recordsWritten)
    }
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val info = e.stageInfo
    val name = info.name.takeWhile(_ != '\n')
    stages.put(info.stageId,
      (name, info.numTasks, info.taskMetrics.executorRunTime))
    ()
  }

  /** Tasks observed so far (listener bus is async — poll before report). */
  def tasksSeen: Long = tasks.get()

  /** Shuffle records written so far — the reference's emitted-pairs
    * counter (its combiner experiment compares exactly this). */
  def shuffleWriteRecordsSeen: Long = shuffleWriteRecords.sum()

  /** Stable-ordered text report (the metrics_report.txt analog). */
  def report(): String = {
    val sb = new StringBuilder
    val wallS = (System.nanoTime() - t0) / 1e9
    def sec(title: String): Unit = { sb ++= s"\n== $title ==\n"; () }
    sb ++= "GRAFT METRICS REPORT\n"
    sec("Job Configuration")
    sb ++= f"jobs: ${jobs.get()}%d\ntasks: ${tasks.get()}%d (failed ${failedTasks.get()}%d)\n"
    sec("Timing")
    sb ++= f"wall: $wallS%.3f s\n"
    sb ++= f"task run time: ${runTimeMs.sum()}%d ms (cpu ${cpuTimeNs.sum() / 1000000}%d ms, gc ${gcTimeMs.sum()}%d ms)\n"
    sec("Input / Output")
    sb ++= f"input: ${inputBytes.sum()}%d bytes, ${inputRecords.sum()}%d records\n"
    sb ++= f"output: ${outputRecords.sum()}%d records\n"
    sec("Shuffle (the reference's emit/flush boundary)")
    sb ++= f"write: ${shuffleWriteBytes.sum()}%d bytes, ${shuffleWriteRecords.sum()}%d records\n"
    sb ++= f"read:  ${shuffleReadBytes.sum()}%d bytes, ${shuffleReadRecords.sum()}%d records\n"
    sb ++= f"spill: ${spillBytes.sum()}%d bytes\n"
    sec("Top 10 stages by task runtime (skew diagnostics)")
    stages.asScala.toSeq
      .sortBy { case (id, (_, _, rt)) => (-rt, id) }
      .take(10)
      .foreach { case (id, (name, n, rt)) =>
        val maxMs = stageMaxTaskMs.getOrDefault(id, 0L)
        val mean = if (n > 0) rt / n else 0L
        sb ++= f"stage $id%5d  tasks=$n%4d  runtime=$rt%8d ms  " +
          f"max-task=$maxMs%6d ms  mean=$mean%6d ms  $name%s\n"
      }
    sb.result()
  }

  /** Write the report next to the metrics path the reference used. */
  def write(path: String): Unit = {
    Files.createDirectories(Paths.get(path).toAbsolutePath.getParent)
    Files.writeString(Paths.get(path), report())
    ()
  }
}

object MetricsReport {
  /** Install on a session; returns the live collector. */
  def install(spark: SparkSession): MetricsReport = {
    val m = new MetricsReport
    spark.sparkContext.addSparkListener(m)
    m
  }
}
