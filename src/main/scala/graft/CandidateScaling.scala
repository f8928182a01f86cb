package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.DedupQueries

/** Candidate-density sweep for the dedup pipelines (dev tool, mirrors the
  * reference's mapper-scaling experiment philosophy: measure the scaling
  * claim, don't assert it — reference README.md:330-339).
  *
  * The scale claim under test: q18 (MinHash LSH), q19 (inverted-index
  * Jaccard), and q48 (SimHash byte-banding) generate O(candidates) pairs,
  * never the O(n²) all-pairs space. This prints, per SF dir, the possible
  * pair count against the candidate pairs each pipeline actually
  * materializes — the ratio is the shuffle-volume reduction the banding
  * buys at that corpus density.
  *
  * Usage: runMain graft.CandidateScaling <sfDir> [<sfDir> ...]
  */
object CandidateScaling {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-candidate-scaling",
      Some("local[32]"))
    println("| sf dir | docs | possible pairs | q18 LSH cand | q19 co-shingled | q48 byte-band cand |")
    println("|---|---|---|---|---|---|")
    dirs.foreach { dir =>
      val docs = Tables.documents(spark, dir)
      val n = docs.count()
      val possible = n * (n - 1) / 2

      // q18: LSH band-collision pairs == its full output (no threshold)
      val q18 = DedupQueries.q18MinhashLsh(spark, dir).count()

      // q19's candidate space: distinct co-shingled pairs (the join's
      // output before the Jaccard threshold)
      val sh = Text.shingleRows(docs, "doc_id", "text", 3)
      val q19 = sh.select(col("doc_id").as("a"), col("s"))
        .join(sh.select(col("doc_id").as("b"), col("s")), Seq("s"))
        .where(col("a") < col("b"))
        .select("a", "b").distinct().count()

      // q48's candidate space: distinct byte-band collision pairs (before
      // the hamming<=3 verify)
      val fp = DedupQueries.q20Simhash(spark, dir)
      val banded = fp.select(col("doc_id"),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("band"),
            (shiftright(col("simhash"), j * 8) % 256).as("bv"))): _*)).as("x"))
        .select(col("doc_id"), col("x.band").as("band"), col("x.bv").as("bv"))
      val q48 = banded.select(col("doc_id").as("a"), col("band"), col("bv"))
        .join(banded.select(col("doc_id").as("b"), col("band"), col("bv")),
          Seq("band", "bv"))
        .where(col("a") < col("b"))
        .select("a", "b").distinct().count()

      println(s"| $dir | $n | $possible | $q18 | $q19 | $q48 |")
    }
    spark.stop()
  }
}
