package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.sources.{ManifestTable, ZOrderLayout}

/** THE Z-ORDER DIMENSION TRADE, measured: every dimension added to the
  * Morton interleave halves the per-dimension resolution the same file
  * count can express — so an N-dim layout wins on N-predicate queries
  * and LOSES to a lower-dim layout on queries that constrain only that
  * layout's dimensions. Quantify both sides on lineitem's independent
  * key triple at one file budget: kept-file counts for the 3-predicate
  * rectangle AND for each 1-predicate slice, across the 1-D clustered,
  * all three 2-D, and the 3-D layouts (all with v4 stats stamped for
  * all three columns — only the curve differs).
  * Run: `sbt "runMain graft.tools.ZDimProbe [sfDir]"`.
  * Findings land in SCALING.md §"Round 18: the z-order dimension
  * trade". */
object ZDimProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.create("graft-zdimprobe", Some("local[32]"))
    val cols = ZOrderLayout.Z3Cols
    val li = Tables.lineitem(spark, dir)
      .select(cols.map(col) :+ col("l_returnflag"): _*)
    val files = 64
    // per-column [min, max] — bucketing from the ACTUAL min, not 0: a
    // column whose domain starts far above 0 (or below) would compress
    // into few buckets / feed zValueN out-of-range inputs otherwise
    // (mirrors optimizeZOrderCols' own domain resolution)
    val domain: Map[String, (Long, Long)] =
      li.agg(min(col(cols(0))), max(col(cols(0))),
          min(col(cols(1))), max(col(cols(1))),
          min(col(cols(2))), max(col(cols(2))))
        .head() match { case r =>
          cols.zipWithIndex.map { case (c, i) =>
            c -> (r.getLong(2 * i), r.getLong(2 * i + 1)) }.toMap
        }
    val rect3 = cols.map { c =>
      val (lo, hi) = domain(c)
      (c, lo, lo + (hi - lo) / 4) // each dim's lower quarter
    }
    def build(order: Seq[String]): String = {
      val root = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"),
        s"zdim_${order.mkString("_")}").toString
      val zv =
        if (order.size == 1) col(order.head)
        else ZOrderLayout.zValueN(order.map { c =>
          val (lo, hi) = domain(c)
          expr(ZOrderLayout.zBucketSql(s"CAST(`$c` AS BIGINT)",
            lo.toString, (hi - lo + 1).toString, "DIV"))
        })
      ManifestTable.overwrite(spark, root,
        li.withColumn("zv", zv)
          .repartitionByRange(files, col("zv"))
          .sortWithinPartitions("zv").drop("zv"),
        statsCols = cols)
      root
    }
    def kept(root: String, rect: Seq[(String, Long, Long)]): Int =
      ManifestTable.readWhereRect(spark, root, rect).inputFiles.length
    val layouts = Seq(
      Seq(cols(0)), Seq(cols(1)), Seq(cols(2)),
      Seq(cols(0), cols(1)), Seq(cols(0), cols(2)),
      Seq(cols(1), cols(2)), cols)
    println(s"[zdim] $files files, rect = each dim's lower quarter")
    layouts.foreach { order =>
      val root = build(order)
      val k3 = kept(root, rect3)
      val k1s = rect3.map(r => kept(root, Seq(r)))
      println(s"[zdim] layout=${order.mkString("+")} " +
        s"rect3=$k3 " +
        rect3.map(_._1).zip(k1s).map { case (c, k) => s"$c=$k" }
          .mkString("1-pred: ", " ", ""))
    }
    spark.stop()
  }
}
