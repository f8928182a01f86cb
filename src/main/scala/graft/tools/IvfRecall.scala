package graft.tools

import graft.GraftSession
import graft.operators.SimilarityQueries

/** Recall sweep for the IVF ANN index (q39/q57): measures recall@10 of
  * the IVF query path against the exact brute-force top-10 (q17), per
  * codebook (init = first-NumCells vectors, kmeans = after the Lloyd
  * rounds) and per nProbe — the two knobs a user of the index actually
  * turns. This is the evidence table SCALING.md cites; everything is
  * deterministic (md5-derived data, integer-exact Lloyd sums), so the
  * numbers reproduce bit-for-bit.
  *
  * Recall@10 = |IVF top-10 ∩ exact top-10| / |exact top-10|, averaged
  * over the 10 query vectors. nProbe = NumCells probes every cell, so
  * its recall is 1.0 by construction — the sweep includes it as the
  * self-check row.
  *
  * Usage: runMain graft.tools.IvfRecall [sfDir] [nProbe,nProbe,...]
  */
object IvfRecall {

  /** Per-query neighbor sets of a (query_id, neighbor_id, ...) ranking —
    * ONE definition shared by this tool and the OperatorSpec recall
    * pins, so the spec can never silently measure a different metric
    * than the SCALING.md table. */
  def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  /** Mean recall of `got` against the exact per-query sets. */
  def recallVs(exact: Map[Long, Set[Long]],
               got: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, ex) =>
      got.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size }
    per.sum / per.size
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val probes =
      if (args.length > 1) args(1).split(",").toSeq.map(_.trim.toInt)
      else Seq(1, 2, 4, SimilarityQueries.NumCells)
    val spark = GraftSession.create("graft-ivf-recall", Some("local[32]"))
    val exact = topSets(SimilarityQueries.q17AnnBrute(spark, sfDir))
    def recall(ivf: Map[Long, Set[Long]]): Double = recallVs(exact, ivf)
    println(s"[ivf-recall] sfDir=$sfDir k=10 queries=${exact.size} " +
      s"cells=${SimilarityQueries.NumCells}")
    // cell-balance per quantizer: max/mean cell size (a probe's cost is
    // the probed cells' sizes, so skew = worst-case probe cost)
    println("| codebook | max cell | mean cell | skew (max/mean) |")
    println("|---|---|---|---|")
    val books = Seq(
      "init" -> SimilarityQueries.codebook(spark, sfDir),
      "kmeans" -> SimilarityQueries.kmeansCodebook(spark, sfDir))
    books.foreach { case (name, cents) =>
      val sizes = SimilarityQueries.cellAssignments(spark, sfDir, cents)
        .groupBy("cell").count().collect().map(_.getLong(1))
      val mean = sizes.sum.toDouble / SimilarityQueries.NumCells
      println(f"| $name%s | ${sizes.max}%d | $mean%.1f " +
        f"| ${sizes.max / mean}%.2f |")
    }
    println("| codebook | nProbe | recall@10 |")
    println("|---|---|---|")
    for ((name, cents) <- books; np <- probes) {
      val r = recall(topSets(
        SimilarityQueries.ivfTopK(spark, sfDir, cents, np)))
      println(f"| $name%s | $np%d | $r%.3f |")
    }
    // the IVF-PQ path (q77): kmeans coarse quantizer at the default
    // NProbe, but candidates ranked by asymmetric distance over M·log2(K)
    // bits of code instead of exact cosine over the raw vectors
    val pq = recall(topSets(
      graft.operators.ProductQuantization.q77AnnIvfPq(spark, sfDir)))
    println(f"| kmeans+PQ (ADC, nProbe ${SimilarityQueries.NProbe}) | " +
      f"${SimilarityQueries.NProbe} | $pq%.3f |")
    val rr = recall(topSets(
      graft.operators.ProductQuantization.q78AnnPqRerank(spark, sfDir)))
    println(f"| kmeans+PQ+rerank (IVFADC+R, L=" +
      f"${graft.operators.ProductQuantization.RerankDepth}) | " +
      f"${SimilarityQueries.NProbe} | $rr%.3f |")
    // the PQ code-width sweep: (subspaces M, codebook K) operating
    // points through the SHIPPED training recipe and query shape
    // (pqModelAt/adcRankedAt) — M·log2(K) bits per code. M=8,K=256 is
    // the FAISS-default one-byte-code point; M=16,K=16 is the shipped
    // 64-bit setting.
    println("| PQ setting | bits/code | ADC recall@10 | +rerank L=100 |")
    println("|---|---|---|---|")
    for ((m, k) <- Seq((8, 4), (8, 16), (16, 16), (8, 256))) {
      val bits = m * (math.log(k) / math.log(2)).round
      val adc = recall(topSets(
        graft.operators.ProductQuantization.adcRankedAt(spark, sfDir, m, k)
          .where(org.apache.spark.sql.functions.col("rank") <= 10)))
      val rer = recall(topSets(
        graft.operators.ProductQuantization.rerankAt(spark, sfDir, m, k)))
      println(f"| M=$m%d K=$k%d | $bits%d | $adc%.3f | $rer%.3f |")
    }
    spark.stop()
  }
}
