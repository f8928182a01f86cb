package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Adjacent-pair LCP distribution of the stored suffix index (dev
  * measurement for the q154 shuffle-bytes design): the fraction of
  * adjacent pairs whose LCP reaches a truncation width T decides
  * whether a T-truncated first-pass exchange with a tie-break second
  * pass can beat shipping full PrefixCap prefixes. Also reports the
  * index's byte shape (rows, avg pref length).
  *
  *   runMain graft.tools.LcpProbe [<sfDir>]
  */
object LcpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-lcpprobe", Some("local[32]"))
    val idx = graft.operators.SuffixRefresh.indexA(spark, sfDir)
      .localCheckpoint()
    val n = idx.count()
    val avgLen = idx.agg(avg(length(col("pref")))).head.getDouble(0)
    println(f"[lcp] index rows $n%d, avg pref chars $avgLen%.1f")
    // adjacent pairs within each stored range partition, same scan
    // shape as SuffixRefresh.innerMaxOf (cross-doc and same-doc both
    // counted: the exchange ships every row either way)
    import spark.implicits._
    val ls = idx.select("part", "doc_id", "pref")
      .repartition(col("part"))
      .sortWithinPartitions("part", "pref", "doc_id")
      .rdd.mapPartitions { it =>
        var curPart = Int.MinValue
        var prevPref: String = null
        it.map { r =>
          val p = r.getAs[Int]("part")
          val pref = r.getAs[String]("pref")
          val l =
            if (p == curPart && prevPref != null)
              graft.functions.CommonPrefixLen.prefixChars(prevPref, pref)
            else -1
          curPart = p; prevPref = pref
          l
        }.filter(_ >= 0)
      }.toDF("l")
    val total = ls.count().toDouble
    Seq(8, 16, 24, 32, 48, 64, 96, 127).foreach { t =>
      val c = ls.where(col("l") >= t).count()
      println(f"[lcp] pairs with LCP >= $t%3d: $c%9d  (${c / total * 100}%.1f%%)")
    }
    spark.stop()
  }
}
