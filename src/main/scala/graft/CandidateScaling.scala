package graft

import graft.operators.DedupQueries

/** Candidate-density sweep for the dedup pipelines (dev tool, mirrors the
  * reference's mapper-scaling experiment philosophy: measure the scaling
  * claim, don't assert it — reference README.md:330-339).
  *
  * The scale claim under test: q18 (MinHash LSH), q19 (inverted-index
  * Jaccard), q48 (SimHash byte-banding) and q87 (SemDeDup in-cell
  * pairing) generate O(candidates) pairs, never the O(n²) all-pairs
  * space. This prints, per SF dir, the possible pair count against the
  * candidate pairs each pipeline actually materializes — the ratio is
  * the shuffle-volume reduction the banding/clustering buys at that
  * corpus density. For q87 the candidate count is Σ s_c(s_c−1)/2 over
  * cell sizes — n²/(2k) at perfect balance with k = NumCells — so its
  * column doubles as the measured cell-balance evidence; the vector
  * corpus column (`vecs`) is its denominator.
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
    println("| sf dir | docs | possible pairs | q18 LSH cand | q19 co-shingled | q48 byte-band cand | q48 60-bit cand | vecs | possible vec pairs | q87 in-cell cand | q87 cand k=64 |")
    println("|---|---|---|---|---|---|---|---|---|---|---|")
    dirs.foreach { dir =>
      val docs = Tables.documents(spark, dir)
      val n = docs.count()
      val possible = n * (n - 1) / 2

      // each count calls the OPERATOR's own candidate-space builder, so
      // the sweep cannot drift from the shipped join shapes
      val q18 = DedupQueries.q18MinhashLsh(spark, dir).count()
      val q19 = DedupQueries.shingleIntersections(spark, dir).count()
      val q48 = DedupQueries.simhashCandidates(spark, dir).count()
      val q48w = DedupQueries.simhashCandidates(spark, dir, fpBits = 60).count()
      val nv = Tables.embeddings(spark, dir).count()
      val possibleV = nv * (nv - 1) / 2
      val q87 = operators.SimilarityQueries.semdedupCandidates(spark, dir)
        .count()
      // the k knob, measured at a second operating point: at perfect
      // balance in-cell pairs = n**2/2k, so k 16 -> 64 should cut the
      // candidate space ~4x (skew shows up as a smaller cut)
      val q87k64 = operators.SimilarityQueries
        .semdedupCandidatesAt(spark, dir, 64).count()

      println(s"| $dir | $n | $possible | $q18 | $q19 | $q48 | $q48w | $nv | $possibleV | $q87 | $q87k64 |")
    }
    spark.stop()
  }
}
