package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.TableProfile

/** Why does the approx profile cost what it costs? Isolate the HLL++
  * precision knob: time the exact profile, the approx profile, and the
  * bare multi-column approx aggregation at rsd 0.05 / 0.01 / 0.005.
  * Run: `sbt "runMain graft.tools.Q180Probe [sfDir]"`. */
object Q180Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-q180probe", Some("local[32]"))
    val li = Tables.lineitem(spark, dir)
    val cols = li.columns.toSeq
    def timed(label: String)(f: => Unit): Unit = {
      f // warm
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q180probe] $label min=${samples.min}%.2f s " +
        f"(${samples.map(s => f"$s%.2f").mkString(",")})")
    }
    timed("profile_exact")(TableProfile.profile(spark, li).count())
    timed("profile_approx")(TableProfile.profileApprox(spark, li).count())
    for (rsd <- Seq(0.05, 0.02, 0.01)) {
      val aggs = cols.map(c => approx_count_distinct(col(c), rsd))
      timed(s"agg_approx_rsd$rsd")(li.agg(aggs.head, aggs.tail: _*)
        .collect())
    }
    val exactAggs = cols.map(c => countDistinct(col(c)))
    timed("agg_exact")(li.agg(exactAggs.head, exactAggs.tail: _*)
      .collect())
    spark.stop()
  }
}
