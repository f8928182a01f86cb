package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan-inspection tool: for each named query (or all), time the planning
  * phases separately from execution and optionally dump the formatted
  * physical plan. Usage:
  *
  *   runMain graft.tools.Explain <sfDir> <queryName>[,<queryName>...] [plan]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val showPlan = args.length > 2 && args(2) == "plan"
    val spark = GraftSession.create("graft-explain", Some("local[32]"))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val qe = df.queryExecution
      qe.analyzed
      val t1 = System.nanoTime()
      qe.optimizedPlan
      val t2 = System.nanoTime()
      qe.executedPlan
      val t3 = System.nanoTime()
      val n = df.count()
      val t4 = System.nanoTime()
      def ms(a: Long, b: Long): Long = (b - a) / 1000000
      println(f"[explain] $name%-24s analyze=${ms(t0, t1)}%5dms " +
        f"optimize=${ms(t1, t2)}%5dms plan=${ms(t2, t3)}%5dms " +
        f"exec=${ms(t3, t4)}%6dms rows=$n")
      if (showPlan) println(qe.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
