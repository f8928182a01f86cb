package graft

import graft.operators.DedupQueries

/** Registry contracts that the operator suites exercise only
  * implicitly. */
class ArtifactsSpec extends SparkSpec {

  test("a second live session cannot rebuild another session's artifact") {
    // rebuilding drops + rewrites the warehouse files while the first
    // session's live plans may still reference them, so the registry
    // refuses rather than silently corrupting the owner — the
    // single-active-session assumption, enforced instead of assumed.
    DedupQueries.shingles(spark, sfDir).count() // owned by the shared session
    val other = spark.newSession()
    val e = intercept[IllegalStateException] {
      DedupQueries.shingles(other, sfDir)
    }
    assert(e.getMessage.contains("another live session"))
  }

  test("materialize is idempotent per session: one build, stable reads") {
    val a = DedupQueries.shingles(spark, sfDir)
    val b = DedupQueries.shingles(spark, sfDir)
    assert(a.count() === b.count())
  }
}
