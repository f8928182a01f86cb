package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftSession, Tables}
import graft.functions.Text

/** Throwaway: is wordShingles re-evaluating tokens per lambda element? */
object DebugShingles {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("debug-sh", Some("local[32]"))
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[dbg] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    val docs = Tables.documents(spark, sfDir)
    t("warm scan")(docs.count())
    t("tokens only")(docs.select(explode(Text.tokens(col("text")))).count())
    t("wordShingles (lambda)")(
      docs.select(explode(Text.wordShingles(col("text"), 3))).count())
    // window-based shingles: tokenize once, posexplode, lead()
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val sh2 = docs
      .select(col("doc_id"), posexplode(Text.tokens(col("text"))))
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", col("col"), lead(col("col"), 1).over(w),
          lead(col("col"), 2).over(w)).as("s"),
        count(lit(1)).over(Window.partitionBy("doc_id")).as("n"))
      .where(col("pos") <= greatest(col("n") - 3, lit(0)))
      .select(col("doc_id"), col("s")).distinct()
    t("window shingles")(sh2.count())
    t("wordShingles again")(
      docs.select(explode(Text.wordShingles(col("text"), 3))).count())
    spark.stop()
  }
}
