package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.Text
import graft.operators.DedupQueries._

/** Throwaway bisection of q18's runtime. */
object DebugQ18 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.create("debug-q18", Some("local[32]"))
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[dbg] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(Text.wordShingles(col("text"), 3)).as("s"))
    t("shingles")(sh.count())
    val minAggs = (0 until NumHashes).map(i =>
      min(md5(concat(lit(s"$i:"), col("s")))).as(s"h$i"))
    val sig = sh.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(i => col(s"h$i")): _*).as("sig"))
    t("signatures")(sig.count())
    val sigM = sig.cache()
    t("sig cached")(sigM.count())
    val bands = sigM.select(
      col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(NumBands - 1)),
        j => md5(concat_ws(",",
          slice(col("sig"), j * lit(RowsPerBand) + lit(1), lit(RowsPerBand)))))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
    t("bands")(bands.count())
    val a = bands.select(col("doc_id").as("doc_id_1"), col("sig").as("sig1"),
      col("band_idx"), col("band_hash"))
    val b = bands.select(col("doc_id").as("doc_id_2"), col("sig").as("sig2"),
      col("band_idx"), col("band_hash"))
    val joined = a.join(b, Seq("band_idx", "band_hash"))
      .where(col("doc_id_1") < col("doc_id_2"))
    t("join")(joined.count())
    val sim = joined.select(col("doc_id_1"), col("doc_id_2"),
      round(size(filter(zip_with(col("sig1"), col("sig2"),
        (x, y) => x === y), m => m)) / lit(NumHashes.toDouble), 4)
        .as("est_jaccard"))
    t("sim")(sim.count())
    t("distinct")(sim.distinct().count())
    t("full q18")(graft.SparkEntry.queries("q18_minhash_lsh")(spark, sfDir).count())
    spark.stop()
  }
}
