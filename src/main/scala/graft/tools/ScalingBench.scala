package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.Text

/** Thread-scaling sweep, mirroring the reference's mapper-scaling
  * experiment (reference README.md:330-339: m=1→20 gave 9.70× at 49%
  * efficiency on the inverted-index workload). One JVM, sequential
  * sessions at local[n]; workload = the map-heavy flagship (tokenize +
  * count over documents, the word-count shape) plus a shuffle-heavy
  * aggregate, both at the bench scale factor.
  *
  *   runMain graft.tools.ScalingBench [sfDir] [out.md]
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) Some(args(1)) else None
    val threads = Seq(1, 2, 4, 8, 16, 32)
    val rows = threads.map { n =>
      val spark = GraftSession.create(s"scaling-$n", Some(s"local[$n]"),
        shufflePartitions = math.max(4, n))
      try {
        // amplify the provided tables (self-union) so per-core compute
        // dominates the ~0.4s fixed job overhead, as the reference's
        // 708 MB corpus did for its sweep — otherwise every n measures
        // the scheduler floor, not scaling
        def amplified(k: Int) = {
          val d = Tables.documents(spark, sfDir)
            .select(col("doc_id"), col("text"))
          (1 until k).foldLeft(d)((acc, _) => acc.union(d))
        }
        def mapHeavy(): Long =
          amplified(32)
            .select(explode(Text.tokens(col("text"))).as("w"))
            .groupBy("w").count().count()
        def shuffleHeavy(): Long = {
          val li = Tables.lineitem(spark, sfDir)
          (1 until 8).foldLeft(li)((acc, _) => acc.union(li))
            .groupBy("l_orderkey")
            .agg(sum("l_quantity"), avg("l_extendedprice"),
              countDistinct("l_partkey"))
            .count()
        }
        mapHeavy(); shuffleHeavy() // warm codegen in this session
        def time(f: () => Long): Double = {
          val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
        }
        val m = (1 to 3).map(_ => time(mapHeavy _)).min
        val s = (1 to 3).map(_ => time(shuffleHeavy _)).min
        println(f"[scaling] n=$n%2d map=$m%6.2fs shuffle=$s%6.2fs")
        (n, m, s)
      } finally spark.stop()
    }
    val (_, m1, s1) = rows.head
    val table = new StringBuilder
    table ++= "# SCALING — thread-scaling sweep (graft, local[n])\n\n"
    table ++= s"Workloads at `$sfDir`: map-heavy = tokenize+wordcount over " +
      "documents; shuffle-heavy = per-order aggregate over lineitem. " +
      "Best of 3 after per-session warmup. Reference comparison: its " +
      "mapper sweep scaled 9.70x at m=20 (49% efficiency, README.md:337).\n\n"
    table ++= "| threads | map s | speedup | eff | shuffle s | speedup | eff |\n"
    table ++= "|---|---|---|---|---|---|---|\n"
    rows.foreach { case (n, m, s) =>
      table ++= f"| $n | $m%.2f | ${m1 / m}%.2fx | ${100 * m1 / m / n}%.0f%% " +
        f"| $s%.2f | ${s1 / s}%.2fx | ${100 * s1 / s / n}%.0f%% |\n"
    }
    println(table.result())
    out.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), table.result()))
  }
}
