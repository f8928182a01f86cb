package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.{LayoutMaintenance, ZOrderLayout}

/** Layout-compaction (OPTIMIZE) before/after numbers for SCALING.md:
  * replay the rot-and-repair scenario on the z-ordered events layout at
  * a given scale — clustered base (75%) + 12 full-domain delta appends
  * (25%), q130's rectangle scan before and after compaction. Run:
  * `sbt "runMain graft.tools.CompactionDemo [sfDir]"`. */
object CompactionDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.create("graft-compaction-demo", Some("local[16]"))
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      df.collect()
      def walk(p: SparkPlan): Seq[SparkPlan] = {
        val below = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        Seq(p) ++ below.flatMap(walk)
      }
      walk(df.queryExecution.executedPlan)
        .collect { case s: FileSourceScanExec =>
          s.metrics("numOutputRows").value }.sum
    }
    val z = ZOrderLayout.zEvents(spark, dir)
    val lay = java.nio.file.Files.createTempDirectory("graft-compact-demo")
      .toString + "/zlay"
    z.where(col("event_id") % 4 =!= 0)
      .repartitionByRange(64, col("zv")).sortWithinPartitions("zv")
      .write.parquet(lay)
    for (i <- 0 until 12)
      z.where(col("event_id") % 48 === i * 4)
        .repartition(1).write.mode("append").parquet(lay)
    val (uHi, tLo, tHi) = ZOrderLayout.rectangleOf(spark, dir)
    def rect() = spark.read.parquet(lay).where(
      col("user_id") >= 0L && col("user_id") <= uHi &&
        col("ts") >= lit(ZOrderLayout.tsOfMicros(tLo)) &&
        col("ts") <= lit(ZOrderLayout.tsOfMicros(tHi)))
    val nAll = spark.read.parquet(lay).count()
    val before = (1 to 3).map(_ => scanRows(rect())).min
    println(s"[compact] dir=$dir rows=$nAll rottenScanRows=$before")
    val t0 = System.nanoTime()
    val stats = LayoutMaintenance.compactClustered(spark, lay, "zv", 64)
    val optimizeSec = (System.nanoTime() - t0) / 1e9
    val after = (1 to 3).map(_ => scanRows(rect())).min
    println(f"[compact] files ${stats.filesBefore} -> ${stats.filesAfter}, " +
      f"optimize ${optimizeSec}%.2f s, scanRows $before -> $after " +
      f"(${after * 100.0 / nAll}%.1f%% of table, rotten ${before * 100.0 / nAll}%.1f%%)")
    graft.GraftSession.deleteRecursively(
      new java.io.File(new java.io.File(lay).getParent))
    spark.stop()
  }
}
