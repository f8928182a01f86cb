package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.{CurationPipeline, SuffixQueries, SuffixRefresh}

/** The partition-bounded suffix refresh's scale claim, measured: the
  * refresh cost is governed by the AFFECTED-partition fraction
  * ~min(1, delta positions / partitions), so it wins exactly when the
  * index is wide (production partition counts) relative to the delta.
  * Three readings:
  *  1. the q79 snapshot delta (≈30% of docs churned) at the engine's
  *     default partition count — the honest worst case the q154 bench
  *     number reflects;
  *  2. a SMALL delta (one doc in ~200 edited) across partition counts —
  *     the affected fraction falling as the index widens;
  *  3. refresh wall vs full-rebuild wall for both deltas.
  * Run: `sbt "runMain graft.tools.SuffixRefreshScaling [sfDir]"`.
  * Findings land in SCALING.md §"Partition-bounded suffix refresh". */
object SuffixRefreshScaling {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.create("graft-sfxrefresh", Some("local[16]"))
    val docs = Tables.documents(spark, dir)

    def stateFor(parts: Int) = {
      val tagged = SuffixRefresh.taggedIndexOf(docs, parts).localCheckpoint()
      val inner = SuffixRefresh.innerMaxOf(tagged).localCheckpoint()
      inner.count()
      val sums = SuffixRefresh.toSummaries(SuffixRefresh.summariesOf(tagged))
      (tagged, inner, sums)
    }

    // the two deltas: the q79 recrawl (big) and a 1-in-200 edit (small)
    val deltaBig = {
      val d = CurationPipeline.snapshotDeltaStaged(spark, dir)
      val rem = docs.join(d.where(col("change").isin("removed", "modified"))
        .select("doc_id"), Seq("doc_id"), "left_semi")
        .select("doc_id", "text")
      val add = CurationPipeline.snapshotB(docs)
        .join(d.where(col("change").isin("added", "modified"))
          .select("doc_id"), Seq("doc_id"), "left_semi")
        .select("doc_id", "text")
      ("q79-recrawl", rem, add)
    }
    val deltaSmall = {
      val rem = docs.where(col("doc_id") % 200 === 3)
        .select("doc_id", "text")
      val add = rem.withColumn("text", concat(col("text"), lit(" edited")))
      ("1-in-200-edit", rem, add)
    }
    // one SHORT doc: the regime where delta positions < partitions
    val deltaOne = {
      val one = docs.select(col("doc_id"), col("text"))
        .where(length(col("text")) > 0)
        .orderBy(length(col("text")), col("doc_id")).limit(1)
        .localCheckpoint()
      val add = one.withColumn("text", concat(col("text"), lit(" edited")))
      ("edit-1-shortest", one, add)
    }

    for (parts <- Seq(32, 128, 512)) {
     // ONE state build per partition count — the delta loop below
     // shares it (a rebuild per cell tripled the tool's runtime)
     val (tagged, inner, sums) = stateFor(parts)
     for ((tag, rem, add) <- Seq(deltaBig, deltaSmall, deltaOne)) {
      val dPos = rem.select(sum(length(col("text")))).head().getLong(0) +
        add.select(sum(length(col("text")))).head().getLong(0)
      val t0 = System.nanoTime
      val res = SuffixRefresh.refreshOf(spark, tagged, inner, sums,
        rem, add, minReport = 1)
      res.perDoc.queryExecution.toRdd.count()
      val wall = (System.nanoTime - t0) / 1e9
      println(f"[sfx-refresh] parts=$parts%-4d delta=$tag%-16s " +
        f"delta_pos=$dPos%8d " +
        f"affected=${res.affectedParts.size}%4d/${res.totalParts}%-4d " +
        f"(${100.0 * res.affectedParts.size / res.totalParts}%5.1f%%) " +
        f"refresh_wall=$wall%6.2fs")
     }
    }

    // MANIFEST-backed state: the advance's pruned read opens only the
    // affected partitions' FILES, decided from the manifest's [lo, hi]
    // part bounds — the 10% partition fraction becomes a 10% FILE
    // fraction (no directory listing, no footer reads on skipped files)
    for (parts <- Seq(32, 512)) {
      val base = java.nio.file.Files
        .createTempDirectory("graft-sfxmani").toString
      val roots = SuffixRefresh.buildState(spark, docs, parts, base)
      val (tag, rem, add) = deltaOne
      val t0 = System.nanoTime
      val res = SuffixRefresh.advance(spark, roots, rem, add)
      val wall = (System.nanoTime - t0) / 1e9
      val stats = graft.sources.ManifestTable
        .fileStats(spark, roots.index, Some(1))
      val affected = res.affectedParts.map(_.toLong)
      val opened = stats.count(s =>
        s._2.isEmpty || s._2.exists { case (lo, hi) =>
          affected.exists(k => k >= lo && k <= hi) })
      println(f"[sfx-refresh] MANIFEST parts=$parts%-4d delta=$tag%-16s " +
        f"affected=${res.affectedParts.size}%4d/${res.totalParts}%-4d " +
        f"files_opened=$opened%4d/${stats.size}%-4d advance_wall=$wall%6.2fs")
    }

    // rebuild reference walls (the thing refresh competes with)
    for ((tag, rem, add) <- Seq(deltaBig, deltaSmall)) {
      val removedIds = rem.select("doc_id").distinct()
      val docsB = docs.join(removedIds, Seq("doc_id"), "left_anti")
        .select("doc_id", "text").unionByName(add)
      val t0 = System.nanoTime
      SuffixQueries.suffixRepeatsOf(docsB, SuffixQueries.PrefixCap, 1)
        .queryExecution.toRdd.count()
      val wall = (System.nanoTime - t0) / 1e9
      println(f"[sfx-refresh] FULL-REBUILD delta=$tag%-14s wall=$wall%6.2fs")
    }
    spark.stop()
  }
}
