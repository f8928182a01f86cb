package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ManifestTable

/** The exactly-once upsert sink: a batch's rows and its txn marker
  * land in ONE atomic commit, so every replay window of foreachBatch
  * recovery (the engine re-delivers the last possibly-uncommitted
  * batch) resolves to a no-op — and the marker survives every
  * evolutionary commit, including compaction. */
class ManifestSinkSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, sfDir)
    .select("doc_id", "lang")

  test("replayed batches are no-ops at every recovery window; markers " +
      "survive append and optimize; overwrite resets them") {
    val root = Files.createTempDirectory("graft-sink").toString + "/tbl"
    val app = "sink-spec"
    ManifestTable.overwrite(spark, root, docs.limit(0).repartition(1))
    val b0 = docs.where(col("doc_id") % 2 === 0)
    val b1full = docs.where(col("doc_id") % 2 === 1)
      .unionByName(b0.limit(5).withColumn("lang", lit("xx")))
    // batch 0 applies; its exact replay (crash between commit and
    // engine checkpoint) is a no-op
    assert(ManifestSink.upsertBatch(spark, root, "doc_id", app, b0, 0L))
    val vAfter0 = ManifestTable.currentVersion(spark, root)
    assert(!ManifestSink.upsertBatch(spark, root, "doc_id", app, b0, 0L))
    assert(ManifestTable.currentVersion(spark, root) === vAfter0)
    // batch 1 upserts 5 updated rows; replaying BOTH old ids is a no-op
    assert(ManifestSink.upsertBatch(spark, root, "doc_id", app,
      b1full, 1L))
    assert(!ManifestSink.upsertBatch(spark, root, "doc_id", app, b0, 0L))
    assert(!ManifestSink.upsertBatch(spark, root, "doc_id", app,
      b1full, 1L))
    assert(ManifestTable.lastTxnVersion(spark, root, app) === Some(1L))
    // last-writer-wins state
    assert(ManifestTable.read(spark, root)
      .where(col("lang") === "xx").count() === 5)
    assert(ManifestTable.read(spark, root).count() === docs.count())
    // markers survive an unrelated append and a compaction
    ManifestTable.append(spark, root,
      docs.limit(1).withColumn("doc_id", col("doc_id") + 5000000L))
    assert(ManifestTable.lastTxnVersion(spark, root, app) === Some(1L))
    ManifestTable.optimize(spark, root, "doc_id", 2)
    assert(ManifestTable.lastTxnVersion(spark, root, app) === Some(1L),
      "compaction amnesia'd the sink's cursor — a replayed batch " +
        "would double-apply")
    assert(!ManifestSink.upsertBatch(spark, root, "doc_id", app,
      b1full, 1L))
    // two writer apps keep independent cursors
    assert(ManifestSink.upsertBatch(spark, root, "doc_id", "other-app",
      docs.limit(1), 0L))
    assert(ManifestTable.lastTxnVersion(spark, root, app) === Some(1L))
    assert(ManifestTable.lastTxnVersion(spark, root, "other-app")
      === Some(0L))
    // overwrite replaces the table and resets every marker
    ManifestTable.overwrite(spark, root, docs.limit(3))
    assert(ManifestTable.lastTxnVersion(spark, root, app).isEmpty)
  }
}
