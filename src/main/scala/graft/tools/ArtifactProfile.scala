package graft.tools

import graft._

/** Per-step timing of Bench's one-off artifact build (dev tool): the
  * round-7 bench reported `artifacts_sec` 55 s at sf0.1 — more than the
  * whole 90-query suite — and a single number can't say which build to
  * attack. This prints each step in Bench's exact order (each step sees
  * the artifacts the previous ones materialized, so the marginal cost
  * shown is the cost Bench actually pays).
  *
  * Usage: runMain graft.tools.ArtifactProfile [<sfDir>]
  */
object ArtifactProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-artifact-profile",
      Some("local[32]"))
    val t0 = System.nanoTime()
    def t(name: String)(f: => Any): Unit = {
      val s = System.nanoTime(); f
      println(f"[artprof] $name%-24s ${(System.nanoTime() - s) / 1e9}%8.2f s")
    }
    t("docFeatures")(operators.TextQueries.docFeatures(spark, sfDir).count())
    t("shingles")(operators.DedupQueries.shingles(spark, sfDir).count())
    t("spanFeatures")(operators.DedupQueries.spanFeatures(spark, sfDir).count())
    t("signatures")(operators.DedupQueries.signatures(spark, sfDir).count())
    t("contamination")(
      operators.DedupQueries.contamination(spark, sfDir).count())
    t("clusterLabels")(
      operators.DedupQueries.clusterLabels(spark, sfDir).count())
    t("prewarmDedupMeta")(
      operators.CurationPipeline.prewarmDedupMeta(spark, sfDir))
    t("curatedHandoff")(
      operators.CurationPipeline.curatedHandoff(spark, sfDir).count())
    t("suffixShared")(
      operators.SuffixQueries.suffixShared(spark, sfDir).count())
    t("suffixPositions")(
      operators.SuffixQueries.suffixPositions(spark, sfDir).count())
    t("trimmedFeatures")(
      operators.CurationPipeline.trimmedFeatures(spark, sfDir).count())
    t("suffixRefreshState") {
      operators.SuffixRefresh.indexA(spark, sfDir).count()
      operators.SuffixRefresh.innerMaxA(spark, sfDir).count()
      operators.SuffixRefresh.summariesA(spark, sfDir).count()
    }
    t("kmeansCodebook")(
      operators.SimilarityQueries.kmeansCodebook(spark, sfDir))
    t("pqIndex")(operators.ProductQuantization.pqIndex(spark, sfDir).count())
    // the K=256 point split into its phases: training (two driver
    // collects over the giant-literal distance plans), coding execution
    // (no write), then the artifact write — to tell plan/codegen cost
    // from data cost
    t("pqModel256 (train)")(operators.ProductQuantization.pqModelAt(
      spark, sfDir, operators.ProductQuantization.M256,
      operators.ProductQuantization.K256))
    t("pqCodes256 (no write)")(operators.ProductQuantization
      .computePqCodesAt(spark, sfDir, operators.ProductQuantization.M256,
        operators.ProductQuantization.K256).count())
    t("pqIndex256")(operators.ProductQuantization.pqIndexAt(spark, sfDir,
      operators.ProductQuantization.M256,
      operators.ProductQuantization.K256).count())
    t("refreshedShingles")(
      operators.CurationPipeline.refreshedShingles(spark, sfDir).count())
    t("refreshedSignatures")(
      operators.CurationPipeline.refreshedSignatures(spark, sfDir).count())
    t("refreshedSpanFeatures")(
      operators.CurationPipeline.refreshedSpanFeatures(spark, sfDir).count())
    t("refreshedDocFeatures")(
      operators.CurationPipeline.refreshedDocFeatures(spark, sfDir).count())
    t("refreshedPqIndex")(
      operators.ProductQuantization.refreshedPqIndex(spark, sfDir).count())
    t("eventsDaily")(
      sources.PartitionedSink.eventsDaily(spark, sfDir).count())
    t("zEvents")(
      sources.ZOrderLayout.zEvents(spark, sfDir).count())
    println(f"[artprof] TOTAL ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    spark.stop()
  }
}
