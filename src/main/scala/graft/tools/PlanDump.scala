package graft.tools

import graft.GraftSession

/** Dump `.explain("formatted")` for INTERNAL build plans the declared
  * queries can't show (artifact builds, refresh internals) — the
  * evidence files under plans/rNN/. Usage:
  *
  *   runMain graft.tools.PlanDump <sfDir> <name>
  *
  * Names: pqcodes256 (the K=256 coding projection), q154refresh (the
  * suffix refresh's inner-max pass over the fresh affected content). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("pqcodes256")
    val spark = GraftSession.create("graft-plandump", Some("local[32]"))
    val df = name match {
      case "pqcodes256" =>
        graft.operators.ProductQuantization.computePqCodesAt(spark, sfDir,
          graft.operators.ProductQuantization.M256,
          graft.operators.ProductQuantization.K256)
      case "q154refresh" =>
        graft.operators.SuffixRefresh.q154SuffixRefresh(spark, sfDir)
      case other =>
        throw new IllegalArgumentException(s"unknown plan: $other")
    }
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
