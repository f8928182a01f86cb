package graft.tools

import org.apache.spark.sql.functions.{approx_count_distinct, col, countDistinct}

import graft.GraftSession

/** Dump the table profiler's INTERNAL aggregation plan (q165/q180's
  * real work — the gate's returned frame is a driver-composed
  * LocalTableScan, so `Explain` can't show it). Usage:
  *
  *   runMain graft.tools.ProfilePlan <sfDir> <exact|approx> <widen|nowiden>
  */
object ProfilePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val approx = args.lift(1).contains("approx")
    val widen = args.lift(2).contains("widen")
    val spark = GraftSession.create("graft-profileplan", Some("local[32]"))
    val df = graft.Tables.lineitem(spark, sfDir)
    val agg = graft.operators.TableProfile.aggFrame(spark, df,
      if (approx) c => approx_count_distinct(col(c), 0.02)
      else c => countDistinct(col(c)),
      widen)
    agg.collect()
    println(agg.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
