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

  test("release frees a child session's claim for the next owner") {
    // a newSession() child shares the SparkContext, so it can never be
    // "stopped" on its own and its WeakReference stays uncleared for an
    // arbitrary GC's lifetime — without the explicit release, every other
    // session gets a nondeterministic IllegalStateException for the name.
    val name = "graft_release_probe"
    val child = spark.newSession()
    Artifacts.materialize(child, name, "id") { child.range(5).toDF("id") }
    val e = intercept[IllegalStateException] {
      Artifacts.materialize(spark, name, "id") { spark.range(5).toDF("id") }
    }
    assert(e.getMessage.contains("another live session"))
    Artifacts.release(child)
    val df = Artifacts.materialize(spark, name, "id") {
      spark.range(5).toDF("id")
    }
    assert(df.count() === 5)
  }

  test("materialize is idempotent per session: one build, stable reads") {
    // equal counts alone would also pass if every call silently REBUILT
    // the table (the rebuild is deterministic); the real contract is
    // build-once, so pin the physical files: same names, same mtimes
    // across calls means the second call wrote nothing.
    def listing(): Map[String, Long] = {
      val name = "graft_shingles_" + Tables.dirKey(sfDir)
      val dir = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        name)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(dir).map(f => f.getPath -> f.lastModified()).toMap
    }
    val a = DedupQueries.shingles(spark, sfDir)
    val first = listing()
    assert(first.nonEmpty)
    val b = DedupQueries.shingles(spark, sfDir)
    assert(a.count() === b.count())
    assert(listing() === first, "second materialize call rewrote files")
  }

  test("a rewritten input dir rebuilds: consumers never serve stale rows") {
    // freshness is a hard contract, not a comment: Tables.dirKey folds a
    // listing fingerprint (per-file path + length + mtime) into every
    // artifact name, so rewriting the files under an input dir
    // mid-session re-keys — and therefore rebuilds — every artifact
    // derived from it. Without the fingerprint this test reads the FIRST
    // corpus's shingles after the rewrite.
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-fresh-").toString
    try {
      def write(texts: Seq[String]): Unit =
        texts.zipWithIndex
          .map { case (t, i) =>
            (i.toLong, t, "en", "unit", t.length.toLong) }
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$dir/documents.parquet")
      write(Seq("alpha beta gamma delta epsilon zeta",
        "one two three four five six seven"))
      val before = DedupQueries.shingles(spark, dir).count()
      // rewrite IN PLACE: same dir path, different corpus
      write(Seq("alpha beta gamma delta epsilon zeta eta theta iota",
        "one two three four five six seven eight nine ten",
        "lorem ipsum dolor sit amet consectetur adipiscing elit"))
      val after = DedupQueries.shingles(spark, dir).count()
      assert(after > before,
        s"rewritten dir served stale shingles (before=$before after=$after)")
    } finally GraftSession.deleteRecursively(new java.io.File(dir))
  }

  test("a rewritten dir also retrains the driver-side model caches") {
    // the artifact registry re-keys via the listing fingerprint; the
    // codebook/PQ-model/dedup-trio caches key by the same Tables.dirKey,
    // so a rewrite must RETRAIN rather than assign the fresh vectors
    // against stale centroids — the one driver-side cache class the
    // artifact re-keying alone would not cover
    import spark.implicits._
    import graft.operators.SimilarityQueries
    val dir = java.nio.file.Files
      .createTempDirectory("graft-fresh-vec-").toString
    try {
      def write(scale: Float): Unit =
        (0L until 8L).map(i =>
          (i, Array.fill(SimilarityQueries.Dims)(i * scale), "l"))
          .toDF("vec_id", "embedding", "label")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$dir/embeddings.parquet")
      write(1.0f)
      val before = SimilarityQueries.codebookAt(spark, dir, 4)
      write(5.0f) // same ids, same count — only the content changed
      val after = SimilarityQueries.codebookAt(spark, dir, 4)
      assert(before !== after,
        "rewritten dir served a stale codebook from the driver cache")
    } finally GraftSession.deleteRecursively(new java.io.File(dir))
  }

  test("spark.graft.dirFingerprint=false keys by path only") {
    // the production escape hatch for immutable versioned snapshot
    // layouts: no listing, path hash alone — a rewrite then does NOT
    // re-key (the operator has declared dirs immutable)
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-fresh-knob-").toString
    def write(text: String): Unit =
      Seq((0L, text)).toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
    try {
      write("one")
      val k1 = Tables.dirKey(dir)
      write("two")
      assert(Tables.dirKey(dir) !== k1, "fingerprint on: rewrite must re-key")
      spark.conf.set("spark.graft.dirFingerprint", "false")
      val k3 = Tables.dirKey(dir)
      write("three")
      assert(Tables.dirKey(dir) === k3, "fingerprint off: key must be stable")
    } finally {
      spark.conf.unset("spark.graft.dirFingerprint")
      GraftSession.deleteRecursively(new java.io.File(dir))
    }
  }
}
