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
    val rect3 = Tables.lineitem(spark, dir)
      .agg(max(col(cols(0))), max(col(cols(1))), max(col(cols(2))))
      .head() match { case r =>
        cols.zipWithIndex.map { case (c, i) => (c, 0L, r.getLong(i) / 4) }
      }
    val domain = cols.map(c =>
      c -> li.agg(max(col(c))).head().getLong(0)).toMap
    def build(order: Seq[String]): String = {
      val root = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"),
        s"zdim_${order.mkString("_")}").toString
      val zv =
        if (order.size == 1) col(order.head)
        else ZOrderLayout.zValueN(order.map { c =>
          expr(ZOrderLayout.zBucketSql(s"CAST(`$c` AS BIGINT)", "0",
            (domain(c) + 1).toString, "DIV"))
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
