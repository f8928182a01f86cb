package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsofJoin

/** Pins the native as-of join ([[AsofJoinExec]]) against its composed
  * union+window twin — the differential-oracle discipline: two independent
  * formulations of the same semantics must agree row-for-row, including on
  * an adversarial dataset built to hit every edge of the contract (ties on
  * (key, ts), left rows preceding all right rows, keys absent from the
  * right side, null keys, null timestamps). Plus the plan-shape assertions
  * that make the operator worth having: both sides shuffle on their OWN
  * key (the DeduplicateRelations staleness regression), no window operator
  * anywhere, and the output partitioning survives into a downstream
  * aggregation without a new exchange.
  */
class AsofNativeSpec extends SparkSpec {

  private def q36Inputs: (DataFrame, DataFrame) = {
    val ev = graft.Tables.events(spark, sfDir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("view_event_id"),
        col("value").as("view_value"))
    (clicks, views)
  }

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.toSeq === b.columns.toSeq)
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("native asof ≡ composed asof on the q36 attribution inputs") {
    val (clicks, views) = q36Inputs
    val cols = Seq("view_event_id", "view_value")
    assertSameRows(
      NativeAsofJoin.asof(clicks, views, "user_id", "ts", cols),
      AsofJoin.asof(clicks, views, "user_id", "ts", cols))
  }

  test("native asof ≡ composed asof on the adversarial edge-case data") {
    import spark.implicits._
    def ts(s: Long): Timestamp = new Timestamp(s * 1000L)
    // key 1: ties on (key, ts) among right rows (tie-break must pick the
    //        greatest rightCols tuple on both paths)
    // key 2: left row BEFORE any right row (null fill) + one after
    // key 3: key entirely absent from the right side
    // key 4: exact ts equality left==right (at-or-before includes it)
    // null key rows on both sides; null ts rows on both sides
    val left = Seq(
      (Option(1L), Option(ts(100)), "l1"),
      (Option(1L), Option(ts(200)), "l2"),
      (Option(2L), Option(ts(10)), "l3"),
      (Option(2L), Option(ts(99)), "l4"),
      (Option(3L), Option(ts(50)), "l5"),
      (Option(4L), Option(ts(70)), "l6"),
      (Option.empty[Long], Option(ts(5)), "l7"),
      (Option(1L), Option.empty[Timestamp], "l8")
    ).toDF("k", "t", "lv")
    val right = Seq(
      (Option(1L), Option(ts(100)), "rA", 1),
      (Option(1L), Option(ts(100)), "rB", 2), // tie on (k, t) with rA
      (Option(1L), Option(ts(150)), "rC", 3),
      (Option(2L), Option(ts(50)), "rD", 4),
      (Option(4L), Option(ts(70)), "rE", 5),  // exact equality with l6
      (Option.empty[Long], Option(ts(1)), "rF", 6),
      (Option(2L), Option.empty[Timestamp], "rG", 7)
    ).toDF("k", "t", "rv", "rn")
    val cols = Seq("rv", "rn")
    val nat = NativeAsofJoin.asof(left, right, "k", "t", cols)
    // The differential twin runs on the NON-NULL subset: on null keys and
    // null timestamps the two formulations legitimately diverge — the
    // window composition groups null keys together and sorts null-ts
    // right rows first (carrying them as "minus infinity"), while the
    // native operator follows the SQL/DuckDB-ASOF rule that a NULL
    // comparison never matches. q36's oracle is DuckDB, so the native
    // rule is the contract; the null rows are pinned explicitly below.
    val comp = AsofJoin.asof(
      left.where(col("k").isNotNull && col("t").isNotNull),
      right.where(col("k").isNotNull && col("t").isNotNull), "k", "t", cols)
    assertSameRows(
      nat.where(col("k").isNotNull && col("t").isNotNull), comp)
    // spot-pin the contract directly (not just the twin): tie at ts=100
    // resolves to the greatest (rv, rn) tuple = rB; l2 at 200 sees rC;
    // l3 precedes rD -> nulls; key 3 -> nulls; exact equality matches rE
    val byLv = nat.collect().map(r => r.getString(2) ->
      (Option(r.getString(3)), Option(r.get(4)))).toMap
    assert(byLv("l1") === (Some("rB"), Some(2)))
    assert(byLv("l2") === (Some("rC"), Some(3)))
    assert(byLv("l3") === (None, None))
    assert(byLv("l4") === (Some("rD"), Some(4)))
    assert(byLv("l5") === (None, None))
    assert(byLv("l6") === (Some("rE"), Some(5)))
    assert(byLv("l7") === (None, None)) // null key never matches
    assert(byLv("l8") === (None, None)) // null left ts never matches
  }

  test("null rightCols values in an equal-(key, ts) tie: non-null wins, " +
      "native ≡ composed") {
    import spark.implicits._
    def ts(s: Long): Timestamp = new Timestamp(s * 1000L)
    // keys and timestamps are all non-null here — the divergent null-key/
    // null-ts regime is pinned above; THIS case isolates the tie-break
    // comparator itself when the rightCols tuple carries nulls, which the
    // other cases never exercised (silent-divergence risk flagged in the
    // round-11 advice):
    //   key 10: (null, 1) vs ("x", 0)  -> first field decides, "x" wins
    //   key 11: (null, 5) vs (null, 2) -> first fields tie as null-null,
    //           the later field breaks the tie, 5 wins
    //   key 12: (null, null) vs (null, 3) -> 3 wins (non-null > null)
    val left = Seq((10L, ts(200), "a"), (11L, ts(200), "b"),
      (12L, ts(200), "c")).toDF("k", "t", "lv")
    val right = Seq(
      (10L, ts(100), Option.empty[String], Option(1)),
      (10L, ts(100), Option("x"), Option(0)),
      (11L, ts(100), Option.empty[String], Option(5)),
      (11L, ts(100), Option.empty[String], Option(2)),
      (12L, ts(100), Option.empty[String], Option.empty[Int]),
      (12L, ts(100), Option.empty[String], Option(3))
    ).toDF("k", "t", "rv", "rn")
    val cols = Seq("rv", "rn")
    val nat = NativeAsofJoin.asof(left, right, "k", "t", cols)
    assertSameRows(nat, AsofJoin.asof(left, right, "k", "t", cols))
    val byLv = nat.collect().map(r => r.getString(2) ->
      (Option(r.getString(3)), Option(r.get(4)))).toMap
    assert(byLv("a") === (Some("x"), Some(0)))
    assert(byLv("b") === (None, Some(5)))
    assert(byLv("c") === (None, Some(3)))
  }

  test("empty sides: no right rows -> all-null fill; no left rows -> empty") {
    import spark.implicits._
    def ts(s: Long): Timestamp = new Timestamp(s * 1000L)
    val left = Seq((1L, ts(10), "l1"), (2L, ts(20), "l2")).toDF("k", "t", "lv")
    val right = Seq((1L, ts(5), "r1", 9)).toDF("k", "t", "rv", "rn")
    val emptyR = right.where(lit(false))
    val gotNoRight = NativeAsofJoin.asof(left, emptyR, "k", "t",
      Seq("rv", "rn")).collect()
    assert(gotNoRight.length === 2)
    assert(gotNoRight.forall(r => r.isNullAt(3) && r.isNullAt(4)))
    val emptyL = left.where(lit(false))
    assert(NativeAsofJoin.asof(emptyL, right, "k", "t",
      Seq("rv", "rn")).collect().isEmpty)
    // name collision must refuse loudly, not shadow silently
    intercept[IllegalArgumentException](
      NativeAsofJoin.asof(left, right.withColumnRenamed("rv", "lv"),
        "k", "t", Seq("lv", "rn")))
    // unknown column names refuse with the side named
    intercept[IllegalArgumentException](
      NativeAsofJoin.asof(left, right, "k", "t", Seq("nope")))
  }

  test("q120 resample+ffill: JVM forward-fill replay; native asof plan") {
    // ground truth: per user, binary-search each hourly slot against the
    // sorted event list — an independent formulation of "last
    // observation at or before the slot" (ties: greatest (event_id,
    // value) tuple, the operator's documented rule)
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000L +
        r.getTimestamp(1).getNanos / 1000 % 1000,
        r.getLong(2), r.getDouble(3)))
    val byUser = ev.groupBy(_._1).map { case (u, rows) =>
      u -> rows.sortBy(r => (r._2, r._3, r._4))
    }
    val hourMicros = 3600L * 1000000
    val want = byUser.flatMap { case (u, rows) =>
      val lo = (rows.map(_._2).min / hourMicros) * hourMicros
      val hi = rows.map(_._2).max
      Iterator.iterate(lo)(_ + hourMicros).takeWhile(_ <= hi).map { slot =>
        val atOrBefore = rows.filter(_._2 <= slot)
        val carried =
          if (atOrBefore.isEmpty) None
          else {
            val maxTs = atOrBefore.map(_._2).max
            // ties on ts resolve to the greatest (event_id, value)
            Some(atOrBefore.filter(_._2 == maxTs)
              .maxBy(r => (r._3, r._4)))
          }
        ((u, slot), carried.map(c => (c._3, c._4)))
      }
    }.toMap
    val df = graft.operators.AsofJoin.q120ResampleFfill(spark, sfDir)
    val got = df.collect().map { r =>
      val slotMicros = java.sql.Timestamp.valueOf(r.getString(1)).getTime *
        1000L
      ((r.getLong(0), slotMicros),
        if (r.isNullAt(2)) None else Some((r.getLong(2), r.getDouble(3))))
    }.toMap
    assert(got === want)
    // leading slots before the first event are null-filled somewhere in
    // the fixture (the hour-truncated grid start guarantees at most one
    // such slot per user; require at least one overall)
    assert(got.values.exists(_.isEmpty), "no null-filled leading slot")
    // the plan runs the native operator
    val asofs = df.queryExecution.executedPlan.toString
    assert(asofs.contains("AsofJoin"), s"native asof absent:\n$asofs")
  }

  test("q125 interpolation: JVM two-sided replay; two chained native " +
      "as-ofs, three exchanges") {
    // ground truth: per user, for each hourly slot take the latest event
    // at-or-before and earliest at-or-after, interpolate linearly in the
    // SAME operand order as the engine expression
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value"))
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000L +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getDouble(2)))
    val hourMicros = 3600L * 1000000
    val want = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val lo = (rows.map(_._2).min / hourMicros) * hourMicros
      val hi = rows.map(_._2).max
      Iterator.iterate(lo)(_ + hourMicros).takeWhile(_ <= hi).map { slot =>
        val before = rows.filter(_._2 <= slot)
        val after = rows.filter(_._2 >= slot)
        val v =
          if (before.isEmpty || after.isEmpty) None
          else {
            val (pu, pv) = { val m = before.maxBy(r => (r._2, r._3))
              (m._2, m._3) }
            val (nu, nv) = { val m = after.filter(
                r => r._2 == after.map(_._2).min).maxBy(_._3)
              (m._2, m._3) }
            Some(if (nu == pu) pv
              else pv + (nv - pv) * ((slot - pu).toDouble / (nu - pu)))
          }
        ((u, slot), v)
      }
    }
    val df = graft.operators.AsofJoin.q125ResampleInterp(spark, sfDir)
    val got = df.collect().map { r =>
      ((r.getLong(0),
        java.sql.Timestamp.valueOf(r.getString(1)).getTime * 1000L),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }.toMap
    assert(got === want)
    assert(got.values.exists(_.isEmpty), "no null leading slot")
    assert(got.values.flatten.nonEmpty, "no interpolated slot")
    df.count() // AQE: inspect the final plan, not the initial one
    val s = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("AsofJoin".r.findAllIn(s).length >= 2,
      s"expected two chained native as-ofs:\n$s")
    // q110's reuse property: one exchange per base relation (grid
    // bounds agg + two event sides); the second as-of re-sorts on the
    // negated instant but must NOT re-shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(exchanges === 3, s"chained-asof exchange reuse broke:\n$s")
  }

  test("staleness tolerance: inclusive boundary, candidate replacement, " +
      "native ≡ composed") {
    import spark.implicits._
    def ts(s: Long): Timestamp = new Timestamp(s * 1000L)
    val tol = 50L * 1000000 // 50 seconds, in timestamp micros
    // key 1: r at 50 — l1 at 100 sits EXACTLY on the boundary (gap ==
    //        tol, inclusive: matches); l2 at 101 is one second past
    //        (null); l0 at 60 is well inside
    // key 2: stale r at 10 is REPLACED by fresh r at 95 — l at 100
    //        must match the replacement, not null out on the old one
    // key 3: only a stale r at 1 — l at 100 nulls, but an earlier l at
    //        40 still matches it (staleness is PER LEFT ROW)
    val left = Seq(
      (1L, ts(60), "l0"), (1L, ts(100), "l1"), (1L, ts(101), "l2"),
      (2L, ts(100), "l3"),
      (3L, ts(40), "l4"), (3L, ts(100), "l5")
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts(50), "r1", 1),
      (2L, ts(10), "r2", 2), (2L, ts(95), "r3", 3),
      (3L, ts(1), "r4", 4)
    ).toDF("k", "t", "rv", "rn")
    val cols = Seq("rv", "rn")
    val nat = NativeAsofJoin.asof(left, right, "k", "t", cols, Some(tol))
    val comp = AsofJoin.asof(left, right, "k", "t", cols, Some(tol))
    assertSameRows(nat, comp)
    val byLv = nat.collect().map(r => r.getString(2) ->
      (Option(r.getString(3)), Option(r.get(4)))).toMap
    assert(byLv("l0") === (Some("r1"), Some(1)))
    assert(byLv("l1") === (Some("r1"), Some(1)), "inclusive boundary broke")
    assert(byLv("l2") === (None, None), "past-boundary match leaked")
    assert(byLv("l3") === (Some("r3"), Some(3)), "candidate replacement broke")
    assert(byLv("l4") === (Some("r4"), Some(4)))
    assert(byLv("l5") === (None, None), "per-left-row staleness broke")
    // zero tolerance: only exact-ts matches survive
    val zero = NativeAsofJoin.asof(left, right, "k", "t", cols, Some(0L))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(zero.values.forall(_.isEmpty), s"zero tolerance leaked: $zero")
    // negative tolerance refuses loudly
    intercept[IllegalArgumentException](
      NativeAsofJoin.asof(left, right, "k", "t", cols, Some(-1L)).collect())
  }

  test("DateType ts: composed tolerance counts DAYS, matching the native " +
      "twin (the bare cast('long') used to fail analysis here)") {
    import spark.implicits._
    def d(s: String): java.sql.Date = java.sql.Date.valueOf(s)
    // tolerance = 5 days: r at Jan 01; l1 at Jan 06 sits exactly on the
    // inclusive boundary, l2 at Jan 07 is one day past
    val left = Seq((1L, d("2024-01-06"), "l1"), (1L, d("2024-01-07"), "l2"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, d("2024-01-01"), "r1")).toDF("k", "t", "rv")
    for (asofFn <- Seq(
        AsofJoin.asof(_: DataFrame, _: DataFrame, _: String, _: String,
          _: Seq[String], Some(5L)),
        NativeAsofJoin.asof(_: DataFrame, _: DataFrame, _: String,
          _: String, _: Seq[String], Some(5L)))) {
      val got = asofFn(left, right, "k", "t", Seq("rv"))
        .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
      assert(got === Map("l1" -> Some("r1"), "l2" -> None))
    }
  }

  test("chunked hourly grid == single-level sequence; wide-span user " +
      "stays day-bounded") {
    import spark.implicits._
    def ts(s: String): Timestamp = Timestamp.valueOf(s)
    // one user spanning 3+ years (a single-level sequence would build a
    // ~28k-element array for it), one spanning minutes, one crossing a
    // day boundary mid-hour, one with a single event (lo == hi span)
    val ev = Seq(
      (1L, ts("2021-03-05 07:14:09"), 1L, 0.5),
      (1L, ts("2024-06-01 22:40:00"), 2L, 1.5),
      (2L, ts("2023-01-01 10:05:00"), 3L, 2.5),
      (2L, ts("2023-01-01 10:55:00"), 4L, 3.5),
      (3L, ts("2023-05-09 23:30:00"), 5L, 4.5),
      (3L, ts("2023-05-10 00:45:00"), 6L, 5.5),
      (4L, ts("2023-08-01 12:00:00"), 7L, 6.5)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = graft.operators.AsofJoin.hourlyGrid(ev)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    val single = ev.groupBy("user_id")
      .agg(date_trunc("hour", min(col("ts"))).as("lo"),
        max(col("ts")).as("hi"))
      .select(col("user_id"),
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    assert(got.sorted === single.sorted,
      "chunked grid drifted from the single-level sequence")
    // the wide-span user really exercised the chunking: > 28k slots
    assert(got.count(_._1 == 1L) > 28000)
    assert(got.count(_._1 == 4L) === 1, "single-event user: one slot")
    assert(got.count(_._1 == 3L) === 2, "mid-hour day crossing")
  }

  test("q122 tolerance grid: q120 with stale slots nulled, nothing else") {
    val base = graft.operators.AsofJoin.q120ResampleFfill(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getDouble(3)))))
      .toMap
    val tol = graft.operators.AsofJoin.q122ResampleTolerance(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getDouble(3)))))
      .toMap
    assert(tol.keySet === base.keySet, "tolerance changed the grid itself")
    // every tolerance value is either q120's value or null — never a
    // DIFFERENT match (the bound can only blank, not re-match)
    for ((slot, v) <- tol)
      assert(v.isEmpty || v === base(slot), s"re-match at $slot")
    val blanked = tol.count { case (s, v) => v.isEmpty && base(s).nonEmpty }
    assert(blanked > 0, "no slot blanked — tolerance vacuous at this SF")
    assert(tol.values.count(_.nonEmpty) > 0, "everything blanked")
  }

  test("plan: AsofJoinExec, per-side own-key exchanges, no window/union") {
    // AQE off for this one: query stages are leaves to collect(), hiding
    // the exec node; the raw plan exposes it for attribute assertions
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (clicks, views) = q36Inputs
      val df = NativeAsofJoin.asof(clicks, views, "user_id", "ts",
        Seq("view_event_id", "view_value"))
      val finalPlan = df.queryExecution.executedPlan
      val asofs = finalPlan.collect { case e: AsofJoinExec => e }
      assert(asofs.length === 1, s"expected one AsofJoinExec in:\n$finalPlan")
      val exec = asofs.head
      // the regression this spec exists for: after DeduplicateRelations
      // the node's right-side expressions must reference the RIGHT child's
      // attributes (the bug planned the right exchange on the left exprId)
      assert(exec.left.outputSet.contains(exec.leftKey))
      assert(exec.right.outputSet.contains(exec.rightKey))
      assert(exec.rightCols.forall(exec.right.outputSet.contains))
      val s = finalPlan.toString
      assert(!s.contains("Window"), s"window operator leaked into:\n$s")
      assert(!s.contains("Union"), s"union leaked into:\n$s")
      assert(s.sliding("Exchange".length).count(_ == "Exchange") === 2,
        s"expected exactly the two per-side exchanges in:\n$s")
      // and the merge produces the right answer under this exact plan
      assert(df.count() === AsofJoin.q36AsofJoin(spark, sfDir).count())
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("chained as-ofs: three exchanges total, left side sorted once") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = AsofJoin.q110AsofChain(spark, sfDir)
        .queryExecution.executedPlan
      val execs = df.collect { case e: AsofJoinExec => e }
      assert(execs.length === 2, s"expected both native joins in:\n$df")
      val s = df.toString
      // one exchange per BASE relation; the second join's left child is
      // the first join's output, already partitioned on user_id — a
      // fourth exchange would mean the reuse property broke
      val exchanges = s.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning")
      assert(exchanges === 3, s"left-side exchange reuse broke:\n$s")
      // sorts: one per right side + ONE for the left across both joins
      // (the first join's output ordering satisfies the second's
      // requirement); the global orderBy adds its own range sort
      val innerSorts = s.linesIterator
        .count(l => l.contains("Sort [") && !l.contains("rangepartitioning")
          && l.contains("ASC NULLS FIRST], false"))
      assert(innerSorts === 3, s"left-side sort reuse broke:\n$s")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("output partitioning feeds a downstream per-key agg with no new exchange") {
    val (clicks, views) = q36Inputs
    val agg = NativeAsofJoin.asof(clicks, views, "user_id", "ts",
        Seq("view_event_id", "view_value"))
      .groupBy("user_id").agg(count(col("view_event_id")).as("attributed"))
    agg.queryExecution.toRdd.count()
    val finalPlan = agg.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = finalPlan.toString
    // the two input exchanges are below the AsofJoin; the aggregation on
    // the join key must reuse the join's partitioning instead of adding a
    // third — the property the union+window composition cannot offer
    assert(s.sliding("Exchange".length).count(_ == "Exchange") === 2,
      s"per-key agg after native asof re-shuffled:\n$s")
  }

  test("q135 nearest: JVM replay on real data; constructed tie and edge cases") {
    import spark.implicits._
    // full replay over the fixture
    val ev = graft.Tables.events(spark, sfDir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    def us(t: Timestamp): Long = t.getTime / 1000 * 1000000 + t.getNanos / 1000
    val byUser = views.groupBy(_._1)
    val expect = clicks.map { case (u, ts, id) =>
      val t = us(ts)
      val vs = byUser.getOrElse(u, Array.empty)
      val back = vs.filter(v => us(v._2) <= t)
        .sortBy(v => (us(v._2), v._3)).lastOption
      val fwd = vs.filter(v => us(v._2) > t)
        .sortBy(v => (us(v._2), v._3)).headOption
      val (nid, gap, dir) = (back, fwd) match {
        case (None, None) => (null, null, null)
        case (Some(b), None) =>
          (b._3: java.lang.Long, (t - us(b._2)): java.lang.Long, "backward")
        case (None, Some(f)) =>
          (f._3: java.lang.Long, (us(f._2) - t): java.lang.Long, "forward")
        case (Some(b), Some(f)) =>
          if (t - us(b._2) <= us(f._2) - t)
            (b._3: java.lang.Long, (t - us(b._2)): java.lang.Long, "backward")
          else
            (f._3: java.lang.Long, (us(f._2) - t): java.lang.Long, "forward")
      }
      (u, t, id, nid, gap, dir)
    }.sortBy(e => (e._1, e._2, e._3)).toSeq
    val got = AsofJoin.q135NearestAsof(spark, sfDir).collect().map { r =>
      val t = java.time.LocalDateTime.parse(r.getString(1),
        java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .toInstant(java.time.ZoneOffset.UTC)
      (r.getLong(0), t.getEpochSecond * 1000000 + t.getNano / 1000,
        r.getLong(2),
        if (r.isNullAt(3)) null else (r.getLong(3): java.lang.Long),
        if (r.isNullAt(4)) null else (r.getLong(4): java.lang.Long),
        if (r.isNullAt(5)) null else r.getString(5))
    }.toSeq
    assert(got === expect)
    // constructed: exact tie -> backward; forward-only; backward-only;
    // no view at all
    def ts(sec: Long) = new Timestamp(sec * 1000)
    val c = Seq((1L, ts(100), 10L), (2L, ts(100), 20L),
      (3L, ts(100), 30L), (4L, ts(100), 40L))
      .toDF("user_id", "ts", "event_id")
    val v = Seq(
      (1L, ts(90), 91L), (1L, ts(110), 92L),  // tie: both 10 s away
      (2L, ts(150), 93L),                     // forward only
      (3L, ts(50), 94L)                       // backward only
    ).toDF("user_id", "ts", "event_id")
    val small = AsofJoin.nearestViews(c, v)
      .orderBy("user_id").collect().map(r =>
        (r.getLong(0),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(5)) "none" else r.getString(5)))
    assert(small.toSeq === Seq(
      (1L, 91L, "backward"),  // the pinned tie rule: earlier event wins
      (2L, 93L, "forward"),
      (3L, 94L, "backward"),
      (4L, -1L, "none")))
  }
}
