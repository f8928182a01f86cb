package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.Text

/** Which term of the docFeatures quality score costs (guide §1:
  * measure before rewriting an expression): times the corpus pass with
  * the score built up term by term, at scan parallelism and widened.
  *
  *   runMain graft.tools.QualProbe [<sfDir>]
  */
object QualProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-qualprobe", Some("local[32]"))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    def t(name: String)(mk: org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val best = (1 to 3).map { _ =>
        val s = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - s) / 1e9
      }.min
      println(f"[qualprobe] $name%-28s $best%8.2f s")
    }
    val toks = Text.tokens(col("text"))
    val lex = Seq("the", "and", "was", "for", "that", "with", "his",
      "her", "not", "this")
    def widen(df: org.apache.spark.sql.DataFrame) = df.repartition(32)
    t("tokens+size")(docs.select(size(toks).as("x")))
    t("+normHash")(docs.select(
      xxhash64(Text.normalized(col("text"))).as("x")))
    t("+alnumRatio")(docs.select(
      (length(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
        / greatest(length(col("text")), lit(1))).as("x")))
    t("+hits HOF")(docs.select(
      size(filter(toks, t => array_contains(lit(lex.toArray), t))).as("x")))
    t("full wide tokens")(widen(docs).select(size(toks).as("x")))
    t("wide alnum")(widen(docs).select(
      (length(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
        / greatest(length(col("text")), lit(1))).as("x")))
    t("wide hits HOF")(widen(docs).select(
      size(filter(toks, t => array_contains(lit(lex.toArray), t))).as("x")))
    spark.stop()
  }
}
