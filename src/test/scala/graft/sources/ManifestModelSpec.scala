package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MODEL-BASED RANDOMIZED LIFECYCLE TEST: a random interleaving of
  * every table operation (append, equality delete, delete-sequencing
  * merge, row-level delete/update, optimize, restore, tag) is applied
  * in parallel to the real manifest table AND to an in-memory
  * reference model (a plain Map with snapshot history); after EVERY
  * commit the table read must equal the model exactly, and time
  * travel to any retained version must equal that version's model
  * snapshot. This is the differential-oracle discipline the
  * per-operator specs can't give: the BUG SURFACE of a table format
  * is operation INTERACTION (a merge after a delete after a restore),
  * and a scripted gate only ever walks one path. Seeds are fixed —
  * failures replay deterministically. */
class ManifestModelSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-model").toString +
      "/tbl"

  private def tableState(root: String): Map[Long, String] =
    ManifestTable.read(spark, root)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def df(m: Iterable[(Long, String)]) = {
    import spark.implicits._
    m.toSeq.toDF("doc_id", "text")
  }

  test("random operation interleavings: table == model after every " +
      "commit; time travel == the model's snapshot at that version") {
    for (seed <- Seq(11, 42, 2026)) {
      val rnd = new scala.util.Random(seed)
      val root = freshRoot()
      // seed table: 40 keyed rows
      var model: Map[Long, String] =
        (1L to 40L).map(i => i -> s"doc-$i-v0").toMap
      var outstandingDeletes = Set.empty[Long] // suppressed keys
      var nextKey = 1000L
      var version = ManifestTable.overwrite(spark, root,
        df(model).repartitionByRange(4, col("doc_id"))
          .sortWithinPartitions("doc_id"),
        boundsCol = Some("doc_id"))
      val history = scala.collection.mutable.Map(version -> model)
      var taggedAt = Option.empty[Int]

      def liveKeys: Seq[Long] = model.keys.toSeq.sorted

      for (step <- 1 to 14) {
        val op = rnd.nextInt(8)
        op match {
          case 0 => // append fresh keys (never resurrecting)
            val fresh = (1 to 1 + rnd.nextInt(4)).map { _ =>
              nextKey += 1; nextKey -> s"doc-$nextKey-new" }
            version = ManifestTable.append(spark, root, df(fresh),
              boundsCol = Some("doc_id"))
            model ++= fresh
          case 1 if liveKeys.size > 8 => // equality delete (MoR)
            val victims = rnd.shuffle(liveKeys).take(1 + rnd.nextInt(3))
            version = ManifestTable.deleteWhereKeyIn(spark, root,
              "doc_id", df(victims.map(_ -> "")).select("doc_id"))
            model --= victims
            outstandingDeletes ++= victims
          case 2 if liveKeys.size > 8 => // delete-sequencing merge
            val removes = rnd.shuffle(liveKeys).take(rnd.nextInt(3))
            val resurrect = rnd.shuffle(outstandingDeletes.toSeq)
              .take(rnd.nextInt(2))
            val updates = rnd.shuffle(liveKeys)
              .filterNot(removes.contains).take(1 + rnd.nextInt(3))
            val ups = (resurrect ++ updates)
              .map(k => k -> s"doc-$k-m$step")
            version = ManifestTable.mergeCoW(spark, root, "doc_id",
              df(removes.map(_ -> "")).select("doc_id"), df(ups))._1
            model = model -- removes ++ ups
            outstandingDeletes --= (removes ++ ups.map(_._1))
          case 3 if liveKeys.size > 8 => // row-level CoW delete
            val m = 2 + rnd.nextInt(3)
            val (v, _, rw) = ManifestTable.deleteWhere(spark, root,
              pmod(col("doc_id"), lit(m)) === 0)
            if (rw > 0) version = v
            model = model.filter { case (k, _) => k % m != 0 }
          case 4 => // row-level CoW update (predicate + 2 SETs)
            val m = 2 + rnd.nextInt(3)
            val (v, _, rw) = ManifestTable.updateWhere(spark, root,
              pmod(col("doc_id"), lit(m)) === 1,
              Seq("text" -> concat(col("text"), lit(s"+u$step"))))
            if (rw > 0) version = v
            model = model.map { case (k, t) =>
              k -> (if (k % m == 1) t + s"+u$step" else t) }
          case 5 => // optimize: rows invariant, delete set applied
            version = ManifestTable.optimize(spark, root, "doc_id",
              2 + rnd.nextInt(3))._1
            outstandingDeletes = Set.empty
          case 6 if history.size > 2 => // restore to a random version
            val target = rnd.shuffle(history.keys.toSeq
              .filter(_ < version)).head
            version = ManifestTable.restore(spark, root, target)
            model = history(target)
            // the restored manifest carries that version's delete
            // state; recompute what is suppressed (keys absent from
            // the model that a later append could collide with) — the
            // conservative union keeps the generator from appending
            // possibly-suppressed keys
            outstandingDeletes =
              history.keys.filter(_ <= target).flatMap(v =>
                history(v).keySet -- model.keySet).toSet
          case 7 => // tag the current version (the tag commit itself
            // is a new, content-identical version)
            val target = version
            version = ManifestTable.addTag(spark, root, s"t$step", target)
            taggedAt = Some(target)
          case _ => // skipped guard (too few rows): append instead
            nextKey += 1
            version = ManifestTable.append(spark, root,
              df(Seq(nextKey -> s"doc-$nextKey-fb")),
              boundsCol = Some("doc_id"))
            model += nextKey -> s"doc-$nextKey-fb"
        }
        history(version) = model
        assert(tableState(root) === model,
          s"seed=$seed step=$step op=$op v$version: table != model")
      }
      // time travel: every retained version equals its model snapshot
      ManifestTable.versions(spark, root)
        .filter(history.contains).foreach { v =>
        val got = ManifestTable.readAt(spark, root, v)
          .select("doc_id", "text").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got === history(v),
          s"seed=$seed: time travel to v$v != model snapshot")
      }
      // and the tag (if any) resolves to its version's model
      taggedAt.foreach { v =>
        val name = ManifestTable.tags(spark, root)
          .find(_._2 == v).map(_._1)
        name.foreach { n =>
          val got = ManifestTable.readAtTag(spark, root, n)
            .select("doc_id", "text").collect()
            .map(r => r.getLong(0) -> r.getString(1)).toMap
          assert(got === history(v),
            s"seed=$seed: tag $n != model snapshot at v$v")
        }
      }
    }
  }
}
