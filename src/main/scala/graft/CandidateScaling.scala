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

    // LSH RECALL against exact Jaccard: candidates bound the shuffle,
    // recall bounds what dedup MISSES. Ground truth = q19's exact
    // inverted-index pairs (complete for j >= 0.35: a pair with j > 0
    // shares a shingle by definition); a true pair is "captured" iff
    // the q18 banding emitted it. The s-curve expectation for
    // r-row/b-band banding is P(cand) = 1 - (1 - s^r)^b, so recall
    // must climb toward 1 in the high-similarity buckets where dedup
    // decisions live — a miss there is a false negative the pipeline
    // never gets to verify.
    import org.apache.spark.sql.functions._
    println()
    println("| sf dir | jaccard bucket | true pairs | captured | recall |")
    println("|---|---|---|---|---|")
    dirs.foreach { dir =>
      // persist both sides: each is a full similarity join, and the
      // bucket aggregate would otherwise re-execute them (the sweep
      // loop above already ran the q18 join once for its count)
      val exact = DedupQueries.q19NgramJaccard(spark, dir)
        .select("doc_id_1", "doc_id_2", "jaccard").persist()
      val cand = DedupQueries.q18MinhashLsh(spark, dir)
        .select(col("doc_id_1"), col("doc_id_2"), lit(1).as("hit"))
        .persist()
      val buckets = exact.join(cand, Seq("doc_id_1", "doc_id_2"), "left")
        .select(
          when(col("jaccard") >= 0.9, "[0.90, 1.00]")
            .when(col("jaccard") >= 0.7, "[0.70, 0.90)")
            .when(col("jaccard") >= 0.5, "[0.50, 0.70)")
            .otherwise("[0.35, 0.50)").as("bucket"),
          col("hit"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("truth"), sum(coalesce(col("hit"), lit(0)))
          .as("captured"))
        .orderBy("bucket")
        .collect()
      buckets.foreach { r =>
        val (t, c) = (r.getLong(1), r.getLong(2))
        println(f"| $dir | ${r.getString(0)} | $t | $c | ${c.toDouble / t}%.3f |")
      }
      exact.unpersist(); cand.unpersist()
    }
    spark.stop()
  }
}
