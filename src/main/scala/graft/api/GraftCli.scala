package graft.api

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.metrics.MetricsReport

/** Command-line driver mirroring the reference's `MR_Run` CLI contract
  * (reference job.c:103-120: `-i/-m/-r` thread counts, input files as
  * positional args, usage message when none given; README.md:258 usage):
  *
  *   runMain graft.api.GraftCli --job wordcount|inverted --output DIR
  *       [--partitions N] [--no-combiner] [--threads N]
  *       [--metrics FILE] input files/dirs...
  *
  * Thread-count flags map to their Spark equivalents: mappers/readers →
  * local[N] parallelism (on a cluster: executor count via spark-submit),
  * reducers → shuffle partitions. `--no-combiner` is the
  * MR_DISABLE_COMBINER kill-switch (job.c:209-217); `--metrics` writes the
  * metrics report file the reference always produced.
  */
object GraftCli {

  case class Args(job: String = "inverted", output: String = "",
                  partitions: Int = 32, combiner: Boolean = true,
                  threads: Int = 32, metrics: Option[String] = None,
                  inputs: Vector[String] = Vector.empty)

  private val usage =
    """usage: GraftCli --job wordcount|inverted --output DIR
      |       [--partitions N] [--no-combiner] [--threads N]
      |       [--metrics FILE] input files/dirs...""".stripMargin

  @annotation.tailrec
  def parse(rest: List[String], acc: Args = Args()): Either[String, Args] =
    rest match {
      case Nil => Right(acc)
      case "--job" :: v :: t        => parse(t, acc.copy(job = v))
      case "--output" :: v :: t     => parse(t, acc.copy(output = v))
      case "--partitions" :: v :: t => parse(t, acc.copy(partitions = v.toInt))
      case "--threads" :: v :: t    => parse(t, acc.copy(threads = v.toInt))
      case "--no-combiner" :: t     => parse(t, acc.copy(combiner = false))
      case "--metrics" :: v :: t    => parse(t, acc.copy(metrics = Some(v)))
      case flag :: _ if flag.startsWith("--") => Left(s"unknown flag $flag")
      case path :: t => parse(t, acc.copy(inputs = acc.inputs :+ path))
    }

  def run(spark: SparkSession, a: Args): Unit = {
    val base = a.job match {
      case "wordcount" => SampleJobs.wordCount
      case "inverted"  => SampleJobs.invertedIndex
      case other => throw new IllegalArgumentException(s"unknown job $other")
    }
    val job = base.copy(numPartitions = a.partitions,
      combine = if (a.combiner) base.combine else None)
    val m = a.metrics.map(_ => MetricsReport.install(spark))
    MRJob.runToText(spark, job, MRJob.textInput(spark, a.inputs), a.output)
    for (path <- a.metrics; rep <- m) {
      // the listener bus is async: wait for the counters to quiesce or
      // the report can legitimately say "tasks: 0"
      var last = -1L
      var cur = rep.tasksSeen
      val deadline = System.nanoTime() + 15000000000L
      while (cur != last && System.nanoTime() < deadline) {
        last = cur; Thread.sleep(200); cur = rep.tasksSeen
      }
      rep.write(path)
    }
  }

  def main(argv: Array[String]): Unit =
    parse(argv.toList, Args()) match {
      case Right(a) if a.inputs.nonEmpty && a.output.nonEmpty =>
        val spark = GraftSession.create("graft-cli",
          Some(s"local[${a.threads}]"), shufflePartitions = a.partitions)
        try run(spark, a) finally spark.stop()
      case Right(_) => System.err.println(usage); sys.exit(2)
      case Left(err) =>
        System.err.println(s"error: $err\n$usage"); sys.exit(2)
    }
}
