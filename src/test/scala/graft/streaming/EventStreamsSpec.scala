package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class EventStreamsSpec extends SparkSpec {

  test("streaming time-bucket agrees with the batch q14 pipeline") {
    val streamed = EventStreams.q29StreamTimeBucket(spark, sfDir)
      .collect().map(_.toSeq)
    val batch = graft.operators.RelationalQueries.q14TimeBucket(spark, sfDir)
      .collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("append-mode windows flush completely and agree with batch q14") {
    // the far-future flush event must push the watermark past every real
    // window (no rows stuck in state) and stay out of the aggregates
    val streamed = EventStreams.q60StreamAppendWindows(spark, sfDir)
      .collect().map(_.toSeq)
    val batch = graft.operators.RelationalQueries.q14TimeBucket(spark, sfDir)
      .collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("sessions: events in one session are within gap; totals preserved") {
    val sessions = EventStreams.q30StreamSessions(spark, sfDir).collect()
    val totalEvents = Tables.events(spark, sfDir).count()
    assert(sessions.map(_.getLong(3)).sum === totalEvents)
    // session_start <= session_end always
    sessions.foreach { r =>
      assert(r.getString(1) <= r.getString(2))
    }
  }

  test("q117 streaming session funnel rolls up to batch q112 exactly") {
    // the two formulations share ONE rule set (30-min gap, non-strict
    // view<=click conversion) through different engines: session_window
    // state merging in the micro-batch engine vs lag/cumsum windows in
    // batch. The SHIPPED table-to-table rollup over the streamed
    // session table (EventStreams.q117UserRollup — the downstream-job
    // pattern) must equal q112's output row-for-row, schema included.
    val rolledDf = EventStreams.q117UserRollup(spark, sfDir)
    val batchDf = graft.operators.RelationalQueries
      .q112SessionFunnel(spark, sfDir)
    assert(rolledDf.columns.toSeq === batchDf.columns.toSeq,
      "rollup schema drifted from q112")
    val rolled = rolledDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = batchDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rolled.toSeq === batch.toSeq, "rollup != q112 row-for-row")
    // non-vacuous: the fixture has both converting and non-converting
    // sessions, or the conversion column proves nothing
    val sessions = EventStreams.q117StreamSessionFunnel(spark, sfDir)
      .collect()
    assert(sessions.exists(_.getLong(3) == 1L), "no converted session")
    assert(sessions.exists(_.getLong(3) == 0L), "every session converted")
    assert(rolled.exists(r => r._2 > r._4 && r._4 > 0),
      "no user with a mixed conversion record")
  }

  test("q142 append session funnel: state EVICTED (numRowsRemoved > 0) " +
      "and output == the Complete twin q117") {
    val (df, progress) = EventStreams.q142Run(spark, sfDir)
    val append = df.collect().map(_.toSeq)
    // eviction proof: the watermark really removed finalized sessions
    // from the state store — the property Complete mode (q30/q117,
    // 0 removed in the bench state export) cannot have
    val removed = progress.flatMap(_.stateOperators.toSeq)
      .map(_.numRowsRemoved).sum
    assert(removed > 0, "append-mode sessionizer evicted nothing")
    // the state left at stream end is (at most) the never-finalized
    // flush session — bounded, not corpus-sized
    val finalState = progress.flatMap(_.stateOperators.toSeq)
      .lastOption.map(_.numRowsTotal).getOrElse(-1L)
    assert(finalState >= 0 && finalState <= 2,
      s"final session state not drained: $finalState rows")
    // equality with the Complete twin: same sessions, same funnel bits
    val complete = EventStreams.q117StreamSessionFunnel(spark, sfDir)
      .collect().map(_.toSeq)
    assert(append.toSeq === complete.toSeq)
  }

  test("q104 stream-static join is stateless and batch-equivalent") {
    import org.apache.spark.sql.functions._
    EventStreams.takeStateMetrics() // clear anything a prior suite left
    val streamed = EventStreams.q104StreamStaticJoin(spark, sfDir)
    val got = streamed.collect()
    // stateless by construction: the drain must record NO state rows —
    // a stream-static join keeps nothing in the state store (contrast
    // q43's two-sided buffers); that absence is the operational point
    assert(EventStreams.takeStateMetrics().isEmpty,
      "stream-static join unexpectedly created stream state")
    // batch equivalence (the stream-static contract: per-batch results
    // equal the batch join over the same data)
    val ev = Tables.events(spark, sfDir)
    val profile = ev.where(col("event_type") === "view")
      .groupBy("user_id")
      .agg(count(lit(1)).as("views"),
        round(sum(col("value")), 2).as("view_value"))
    val batch = ev.where(col("event_type") === "click")
      .select("user_id", "event_id")
      .join(profile, Seq("user_id"), "left")
      .select(col("user_id"), col("event_id"),
        coalesce(col("views"), lit(0L)).as("views"),
        coalesce(col("view_value"), lit(0.0)).as("view_value"))
      .orderBy("user_id", "event_id").collect()
    assert(got.toSeq === batch.toSeq)
    // cold-start rows (clicker with no view history) must survive the
    // left join, or the enrichment silently drops new users
    assert(got.nonEmpty)
  }

  test("first-seen dedup emits exactly one row per (user, event_type)") {
    val firsts = EventStreams.q31StreamFirstSeen(spark, sfDir)
    val pairs = Tables.events(spark, sfDir)
      .select(countDistinct(col("user_id"), col("event_type")))
      .collect().head.getLong(0)
    assert(firsts.count() === pairs)
    assert(firsts.groupBy("user_id", "event_type").count()
      .where(col("count") > 1).count() === 0)
  }

  test("q86 stream dedup suppresses cross-batch duplicates exactly") {
    val got = EventStreams.q86StreamDedup(spark, sfDir)
      .collect().map(_.getString(0)).toSeq
    // batch twin over the same recrawl union
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "text")
    val union = docs.unionByName(
      graft.operators.CurationPipeline.snapshotB(docs))
    val want = union
      .select(md5(graft.functions.Text.normalized(col("text")))
        .as("content_md5"))
      .distinct().orderBy("content_md5")
      .collect().map(_.getString(0)).toSeq
    assert(got === want)
    // the dedup actually dropped something: the union carries every
    // unchanged doc twice plus re-added old content under new ids
    val total = union.count()
    assert(got.length < total,
      s"no duplicates suppressed (${got.length} of $total)")
    // and no content key emitted twice (append mode + state store)
    assert(got.distinct.length === got.length)
  }

  test("empty-dir schema fallback is not cached: later files re-probe") {
    // a landing dir probed while EMPTY takes the nanos-long fallback
    // for that plan build only — caching the guess would misread every
    // future build 1000x once differently-encoded files land. After
    // files arrive, the next plan build must probe the REAL encoding.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-probe-").toString
    try {
      val empty = EventStreams.q43StreamIntervalJoin(spark, dir)
      assert(empty.count() === 0, "empty landing dir emitted rows")
      // land events through Spark's writer: a TimestampType ts column,
      // NOT the corpus's native nanos-long — the encoding the cached
      // fallback would get wrong. The landing layout is a single FILE
      // named events.parquet (the fixture layout the glob expects), so
      // the Spark write stages to a scratch dir and the part file moves
      // into place.
      val staging = java.nio.file.Files
        .createTempDirectory("graft-probe-stage-").toString
      Tables.events(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      graft.GraftSession.deleteRecursively(new java.io.File(staging))
      val got = EventStreams.q43StreamIntervalJoin(spark, dir)
      val ts = got.select("click_ts").collect().map(_.getString(0))
      assert(ts.nonEmpty, "no joined rows after files landed")
      assert(ts.forall(_.startsWith("20")),
        s"timestamps misread (nanos fallback applied to non-nanos data): ${ts.head}")
    } finally graft.GraftSession
      .deleteRecursively(new java.io.File(dir))
  }

  test("q137 outer stream join: inner subset == q43; unmatched clicks emit nulls") {
    import org.apache.spark.sql.functions._
    val outer = EventStreams.q137StreamOuterJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else (r.getLong(2): java.lang.Long)))
    // watermark-driven null emission actually happened
    val unmatched = outer.filter(_._3 == null)
    assert(unmatched.nonEmpty, "no unmatched click was ever emitted")
    // matched subset must be EXACTLY the inner join (q43)
    val inner = EventStreams.q43StreamIntervalJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2): java.lang.Long))
    assert(outer.filter(_._3 != null).sortBy(t => (t._1, t._2,
        t._3.longValue)).toSeq ===
      inner.sortBy(t => (t._1, t._2, t._3.longValue)).toSeq)
    // every click appears at least once; unmatched ones exactly once
    val ev = graft.Tables.events(spark, sfDir)
    val clicks = ev.where(col("event_type") === "click")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(outer.map(_._2).toSet === clicks)
    val perClick = outer.groupBy(_._2)
    unmatched.foreach { u =>
      assert(perClick(u._2).length === 1, s"unmatched click ${u._2}")
    }
  }

  test("q144 full outer stream join: matched subset == q43; both sides' " +
      "unmatched rows emit nulls") {
    val full = EventStreams.q144StreamFullOuterJoin(spark, sfDir).collect()
    // matched subset (both ids present) == the inner join q43
    val matched = full.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inner = EventStreams.q43StreamIntervalJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(matched === inner)
    // non-vacuity on BOTH outer sides: clicks without a view in the
    // hour AND views no click ever reached back to
    assert(full.exists(r => r.isNullAt(2) && !r.isNullAt(1)),
      "no unmatched click emitted")
    assert(full.exists(r => r.isNullAt(1) && !r.isNullAt(2)),
      "no unmatched view emitted — the right-outer half is vacuous")
    // left-rows subset (click present) == q137 exactly
    val left = full.filter(r => !r.isNullAt(1)).map(_.toSeq).toSet
    val q137 = EventStreams.q137StreamOuterJoin(spark, sfDir).collect()
      .map(_.toSeq).toSet
    assert(left === q137)
  }

  test("q151 right outer stream join: matched subset == q43; unmatched " +
      "views emit null clicks; == the view-rows half of q144") {
    import org.apache.spark.sql.functions._
    val right = EventStreams.q151StreamRightOuterJoin(spark, sfDir).collect()
    // matched subset (click present) == the inner join q43
    val matched = right.filter(r => !r.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inner = EventStreams.q43StreamIntervalJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(matched === inner)
    // watermark-driven null emission actually happened
    assert(right.exists(_.isNullAt(1)), "no unmatched view emitted")
    // every view appears at least once; unmatched ones exactly once
    val views = graft.Tables.events(spark, sfDir)
      .where(col("event_type") === "view" &&
        col("user_id").isNotNull && col("ts").isNotNull)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(right.map(_.getLong(2)).toSet === views)
    val perView = right.groupBy(_.getLong(2))
    right.filter(_.isNullAt(1)).foreach { u =>
      assert(perView(u.getLong(2)).length === 1,
        s"unmatched view ${u.getLong(2)}")
    }
    // the view-rows half of the FULL outer (view present) == q151,
    // row for row — the matrix cells compose
    val fullViewRows = EventStreams.q144StreamFullOuterJoin(spark, sfDir)
      .collect().filter(r => !r.isNullAt(2)).map(_.toSeq).toSet
    assert(right.map(_.toSeq).toSet === fullViewRows)
  }

  test("q133 streamed SCD2 maintenance equals the q126 batch rebuild") {
    // the CDC apply must produce the SAME history as rebuilding from
    // scratch — row-for-row, schema included, after four quartile
    // micro-batches each of which closes out the previous batch's
    // current rows for every user it touches
    val streamedDf = EventStreams.q133StreamScd2(spark, sfDir)
    val batchDf = graft.operators.RelationalQueries.q126Scd2(spark, sfDir)
    assert(streamedDf.columns.toSeq === batchDf.columns.toSeq)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3),
        if (r.isNullAt(4)) null else r.getString(4), r.getBoolean(5))
    }.toSeq
    val streamed = rows(streamedDf)
    assert(streamed === rows(batchDf), "streamed history != batch rebuild")
    // non-vacuous CDC: multi-version users exist, so later batches
    // actually closed out earlier current rows
    assert(streamed.count(_._6) < streamed.size,
      "every row current: no close-out ever happened")
    assert(streamed.exists(r => r._2 > 1L), "no user has version > 1")
  }
}
