// Scratch diagnostic for the q57/q39 bench move (round 6). Run with:
//   sbt -batch "runMain graft.tools.Q57Diag"
package graft.tools

import graft.GraftSession

object Q57Diag {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("q57diag", Some("local[32]"))
    def time[A](f: => A): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    // warm JIT/classloading on the tiny dir
    graft.operators.SimilarityQueries.q57AnnIvfKmeans(
      spark, "/root/testdata/sf0.001").count()
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      // codebooks cache per (session, dir): build outside the timing
      graft.operators.SimilarityQueries.kmeansCodebook(spark, dir)
      val times = (1 to 5).map { _ =>
        time(graft.operators.SimilarityQueries.q57AnnIvfKmeans(spark, dir).count())
      }
      // split plan-time from execution: collect on a pre-planned df
      val df = graft.operators.SimilarityQueries.q57AnnIvfKmeans(spark, dir)
      val tPlan = time(df.queryExecution.executedPlan)
      val tExec = time(df.count())
      println(f"[diag] $sf%-8s runs=${times.map(t => f"$t%.2f").mkString(",")} plan=$tPlan%.2f exec(after plan)=$tExec%.2f")
    }
    spark.stop()
  }
}
