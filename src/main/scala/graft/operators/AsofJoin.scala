package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (most-recent-at-or-before) join — an operator Spark lacks as a
  * built-in (SURVEY.md custom-operator guidance: compose existing ops when
  * semantics allow, and they do here).
  *
  * Implementation is the union-and-carry-forward composition, NOT a range
  * join: tag both inputs, union them, and within each key carry the latest
  * right-side row forward with `last(ignoreNulls) over (rows unbounded
  * preceding)`. One shuffle on the key, one sort — O(n log n) per key
  * group — where the naive `left.ts >= right.ts` range join materializes
  * O(n·m) pairs per key before aggregation. At 100 TB the range join is a
  * non-starter; this shape is how kdb/Flink/QuestDB implement asof.
  *
  * Tie rule: a right row at exactly left.ts matches (at-or-before); among
  * right rows with equal ts the one with the larger tiebreak column wins
  * (deterministic; DuckDB's ASOF JOIN keys on ts only, so the test oracle
  * uses a unique-ts right side).
  */
object AsofJoin {

  /** Left rows get the most recent right row (per `key`) with
    * right.`ts` <= left.`ts`. Right value columns come back null when no
    * right row precedes the left row.
    *
    * The right columns travel as ONE nullable struct, carried by a single
    * `last(ignoreNulls)` — carrying each column independently would mix
    * fields from different right rows whenever a right column is
    * legitimately null (lastA could come from row 7, lastB from row 5).
    *
    * `tolerance` (same contract as the native twin,
    * [[graft.plans.NativeAsofJoin.asof]]): a match older than the
    * tolerance — in the ts column's internal units, microseconds for
    * timestamps — reads null right columns; the bound is inclusive. The
    * carried struct leads with the matched row's own ts (`__rts`), so
    * staleness is one post-window comparison; prepending it cannot
    * disturb the tie-break (rows tied on (key, ts) tie on `__rts` too). */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightCols: Seq[String],
           tolerance: Option[Long] = None): DataFrame = {
    val lCols = left.columns.toSeq
    val rStructType = org.apache.spark.sql.types.StructType(
      right.schema(ts).copy(name = "__rts") +:
        rightCols.map(c => right.schema(c).copy(name = c)))
    // tag and align schemas: left rows sort after right rows at equal ts
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("__side")) ++
        lCols.filterNot(Set(key, ts)).map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("__side")) ++
        lCols.filterNot(Set(key, ts)).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(ts).as("__rts") +: rightCols.map(col): _*).as("__r"): _*)
    // right rows sort before left rows at equal ts (at-or-before matches);
    // among right rows with equal ts, the WHOLE right struct breaks the
    // tie (struct compare is lexicographic over every field), so the
    // carried row is deterministic even when the first right column
    // ties too — ordering on rightCols.head alone left last() free to
    // carry either of two rows agreeing on (key, ts, head)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc,
        col("__r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // internal-unit extraction matching the native twin's contract:
    // microseconds for timestamps, DAYS for dates (a bare cast("long")
    // fails analysis on DateType), the value itself for integrals
    def units(c: Column): Column = left.schema(ts).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case org.apache.spark.sql.types.DateType =>
        datediff(c, to_date(lit("1970-01-01"))).cast("long")
      case _ => c.cast("long")
    }
    val freshCol = tolerance match {
      case None => col("__c").isNotNull
      case Some(t) =>
        col("__c").isNotNull &&
          units(col(ts)) - units(col("__c.__rts")) <= t
    }
    l.unionByName(r)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(lCols.map(col) ++
        rightCols.map(c =>
          when(freshCol, col(s"__c.$c")).as(c)): _*)
  }

  /** Q36: each click event joined to the user's most recent view event at
    * or before it (classic attribution). */
  def q36AsofJoin(spark: SparkSession, sfDir: String): DataFrame =
    q36Shape(spark, sfDir, asof(_, _, _, _, _))

  /** Q100: the same attribution query planned through the NATIVE as-of
    * operator ([[graft.plans.AsofJoinExec]]) instead of the union+window
    * composition — shares q36's oracle, so the hash gate pins the custom
    * `LogicalPlan`/`SparkStrategy`/`SparkPlan` path against DuckDB's ASOF
    * LEFT JOIN end-to-end. */
  def q100AsofNative(spark: SparkSession, sfDir: String): DataFrame =
    q36Shape(spark, sfDir, graft.plans.NativeAsofJoin.asof(_, _, _, _, _))

  /** Q110: CHAINED native as-of joins — the structural property the
    * custom operator exists for, shipped as a query: each click gets the
    * user's most recent view AND most recent error at-or-before it. The
    * first [[graft.plans.AsofJoinExec]]'s output keeps the left side's
    * hash partitioning and (key, ts) ordering, so the second as-of's
    * left child needs NO new exchange and NO re-sort — the plan carries
    * exactly three exchanges (one per base relation) and the left side
    * sorts once (spec-pinned). The union+window composition re-shuffles
    * and re-sorts the whole widened union per hop; at n hops over 100 TB
    * of events that is n extra corpus-wide exchanges. Oracle = two
    * chained DuckDB ASOF LEFT JOINs. */
  def q110AsofChain(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("view_event_id"))
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts"),
        col("event_id").as("error_event_id"))
    val step1 = graft.plans.NativeAsofJoin.asof(
      clicks, views, "user_id", "ts", Seq("view_event_id"))
    graft.plans.NativeAsofJoin.asof(
        step1, errors, "user_id", "ts", Seq("error_event_id"))
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("event_id"), col("view_event_id"), col("error_event_id"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** Q120: time-grid RESAMPLE with forward fill — the classic
    * time-series op (downsample an irregular event stream to a fixed
    * grid, carrying the last observation forward) expressed as what it
    * IS: an as-of join of the generated grid against the events. Per
    * user, one hourly slot from the hour of their first event to their
    * last; each slot carries the most recent event at or before it
    * (ties by the documented greatest-tuple rule), slots before any
    * event read null. The grid is generated map-side (`sequence` +
    * explode off a per-user bounds aggregate), both sides cluster on
    * user_id, and the custom operator's merge scan does the fill —
    * no window over a global order, no per-slot subquery. Oracle =
    * DuckDB's own grid generation + ASOF LEFT JOIN. */
  def q120ResampleFfill(spark: SparkSession, sfDir: String): DataFrame =
    resampleShape(spark, sfDir, tolerance = None)

  /** Q122: the grid fill with a STALENESS BOUND — real forward-fill
    * caps how far back the carried observation may reach (pandas
    * `merge_asof(tolerance=...)`; an attribution window): a slot whose
    * most recent event is more than [[ResampleToleranceMicros]] old
    * reads null instead of dragging a stale observation across the gap.
    * Same plan as q120 — the tolerance is one comparison inside the
    * native operator's merge scan, no extra exchange, no post-join
    * filter pass. The inclusive boundary (gap == tolerance still fills)
    * is pinned in AsofNativeSpec on constructed timestamps. */
  def q122ResampleTolerance(spark: SparkSession, sfDir: String): DataFrame =
    resampleShape(spark, sfDir, Some(ResampleToleranceMicros))

  /** Two hours, in the timestamp column's internal microseconds — with
    * an hourly grid this keeps a slot filled through one missed hour
    * and blanks longer silences (non-vacuous on the events fixture:
    * user event gaps straddle it in both directions). */
  val ResampleToleranceMicros: Long = 2L * 3600 * 1000000

  private def resampleShape(spark: SparkSession, sfDir: String,
      tolerance: Option[Long]): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .where(col("user_id").isNotNull && col("ts").isNotNull)
    val right = ev.select(col("user_id"), col("ts"),
      col("event_id").as("last_event_id"), col("value").as("last_value"))
    graft.plans.NativeAsofJoin.asof(hourlyGrid(ev), right, "user_id", "ts",
        Seq("last_event_id", "last_value"), tolerance)
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("slot"),
        col("last_event_id"), col("last_value"))
      .orderBy("user_id", "slot")
  }

  /** The per-user hourly slot grid: one row per hour from the hour of
    * the user's first event through their last.
    *
    * Generated in TWO chunked levels — days, then the (at most 24)
    * hours inside each day clipped to [lo, hi] — instead of one
    * `sequence(lo, hi, 1 hour)` per user. A single-level sequence
    * materializes the user's ENTIRE span as one in-memory array inside
    * the generator (a ten-year user = 87,600 timestamps in a single
    * `explode` element); chunking bounds the inner array at 24 and the
    * day-level array at span-days — a 24× cut in peak per-row
    * materialization, with the day rows streaming through the generator
    * pipeline. CONTRACT: the residual bound is the day-level array, one
    * element per calendar day of a user's span (3,653 for ten years);
    * spans where that matters (centuries) would add a third level of
    * the same construction. Equality with the single-level grid and the
    * wide-span bound are spec-pinned in AsofNativeSpec. */
  private[graft] def hourlyGrid(ev: DataFrame): DataFrame =
    ev.groupBy("user_id")
      .agg(date_trunc("hour", min(col("ts"))).as("lo"),
        max(col("ts")).as("hi"))
      .select(col("user_id"), col("lo"), col("hi"),
        explode(expr(
          "sequence(date_trunc('DAY', lo), date_trunc('DAY', hi), " +
            "interval 1 day)")).as("day"))
      .select(col("user_id"),
        explode(expr(
          "sequence(greatest(day, lo), " +
            "least(day + interval 23 hours, hi), interval 1 hour)"))
          .as("ts"))

  /** Q125: time-grid resample with LINEAR INTERPOLATION — the numeric
    * companion to q120's forward fill: each hourly slot reads the value
    * interpolated between the user's latest event at-or-before it and
    * earliest event at-or-after it (slots before any event read null;
    * a slot landing exactly on an event reads that event's value via
    * the prev==next guard, which also keeps 0/0 out of the arithmetic).
    *
    * Plan: TWO chained native as-of joins — backward on ts for the
    * previous observation, then FORWARD expressed as backward on the
    * NEGATED microsecond instant (order-reversal, the same trick a
    * time-series store uses; the operator's ts contract is any integral
    * instant, so a Long column rides the existing merge scan — no
    * forward variant of the operator needed). Both hops key on user_id,
    * so the second as-of adds a re-sort but NO new exchange (q110's
    * chained-reuse property): three exchanges total at any scale. The
    * interpolation itself is one map-side IEEE expression — identical
    * operand order on both engines, so the unrounded doubles
    * hash-match bit-for-bit.
    *
    * Oracle: DuckDB grid + ASOF backward + ASOF backward on the same
    * negated instant, same CASE arithmetic. */
  def q125ResampleInterp(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value"))
      .where(col("user_id").isNotNull && col("ts").isNotNull)
    val prevR = ev.select(col("user_id"), col("ts"),
      unix_micros(col("ts")).as("prev_us"), col("value").as("prev_value"))
    val nextR = ev.select(col("user_id"),
      (-unix_micros(col("ts"))).as("tsn"),
      unix_micros(col("ts")).as("next_us"), col("value").as("next_value"))
    val s1 = graft.plans.NativeAsofJoin.asof(
        hourlyGrid(ev), prevR, "user_id", "ts", Seq("prev_us", "prev_value"))
      .withColumn("tsn", -unix_micros(col("ts")))
    val s2 = graft.plans.NativeAsofJoin.asof(
      s1, nextR, "user_id", "tsn", Seq("next_us", "next_value"))
    val t = unix_micros(col("ts"))
    val interp =
      when(col("prev_us").isNull || col("next_us").isNull,
        lit(null).cast("double"))
      .when(col("next_us") === col("prev_us"), col("prev_value"))
      .otherwise(col("prev_value") +
        (col("next_value") - col("prev_value")) *
          ((t - col("prev_us")).cast("double") /
            (col("next_us") - col("prev_us")).cast("double")))
    s2.select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("slot"),
        interp.as("interp_value"))
      .orderBy("user_id", "slot")
  }

  /** Q135: NEAREST-direction as-of join (pandas
    * `merge_asof(direction='nearest')`, DuckDB has no equivalent):
    * each click is matched to the CLOSEST view event of the same user
    * in either time direction — attribution when the touchpoint may
    * follow the conversion event. Composition: the SAME native merge
    * scan twice (backward as-is, forward = backward over the negated
    * microsecond instant — q125's trick, so exchange/sort reuse
    * applies), then one map-side pick of the smaller gap. TIE RULE,
    * pinned in engine, oracle, and spec: equal gaps choose the EARLIER
    * (backward) event. Gaps are integer microseconds — no float
    * anywhere. */
  def q135NearestAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    nearestViews(
      ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id")),
      ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id")))
      .orderBy("user_id", "ts", "event_id")
  }

  /** The nearest-match composition over explicit click/view relations
    * (columns: user_id, ts, event_id) — split out for the spec's
    * constructed tie cases. */
  private[graft] def nearestViews(clicks: DataFrame,
                                  views: DataFrame): DataFrame = {
    val viewsB = views.select(col("user_id"), col("ts"),
      unix_micros(col("ts")).as("b_us"), col("event_id").as("b_event_id"))
    val viewsF = views.select(col("user_id"),
      (-unix_micros(col("ts"))).as("tsn"),
      unix_micros(col("ts")).as("f_us"), col("event_id").as("f_event_id"))
    val s1 = graft.plans.NativeAsofJoin.asof(
        clicks, viewsB, "user_id", "ts", Seq("b_us", "b_event_id"))
      .withColumn("tsn", -unix_micros(col("ts")))
    val s2 = graft.plans.NativeAsofJoin.asof(
      s1, viewsF, "user_id", "tsn", Seq("f_us", "f_event_id"))
    val t = unix_micros(col("ts"))
    val useB = col("f_us").isNull ||
      (col("b_us").isNotNull && (t - col("b_us")) <= (col("f_us") - t))
    val noMatch = col("b_us").isNull && col("f_us").isNull
    s2.select(col("user_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
      col("event_id"),
      when(useB, col("b_event_id")).otherwise(col("f_event_id"))
        .as("nearest_view_id"),
      when(noMatch, lit(null).cast("long"))
        .when(useB, t - col("b_us")).otherwise(col("f_us") - t)
        .as("gap_us"),
      when(noMatch, lit(null).cast("string"))
        .when(useB, lit("backward")).otherwise(lit("forward"))
        .as("direction"))
  }

  /** Q172: POINT-IN-TIME dimension join — every fact row enriched with
    * the SCD2 dimension version that was valid AT THE FACT'S OWN TIME
    * (the join every warehouse backfill needs; getting it wrong —
    * joining `is_current` — is the classic leakage bug where training
    * features see the future). Because SCD2 intervals TILE each user's
    * timeline, "the version with valid_from ≤ ts < valid_to" is exactly
    * "the latest valid_from ≤ ts" — i.e. the native AS-OF operator
    * ([[graft.plans.NativeAsofJoin]]), one co-partitioned merge scan,
    * NOT an interval nested loop: at 100 TB of facts the BETWEEN
    * formulation is a range join per fact, the as-of is one exchange
    * per side and a linear merge. Zero-width versions (superseded at
    * the same instant — BETWEEN can never match their empty interval)
    * are dropped first, which also makes the right side's (key, ts)
    * unique → the as-of pick is deterministic. Facts before a user's
    * first version surface with null dimension columns (LEFT
    * semantics). Oracle = the BETWEEN formulation verbatim, so the
    * gate pins the tiling argument itself. */
  def q172PointInTimeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val dim = RelationalQueries.scd2Of(RelationalQueries.scd2Updates(ev))
      .where(col("valid_to_ts").isNull ||
        col("valid_to_ts") > col("valid_from_ts"))
      .select(col("user_id"), col("valid_from_ts").as("ts"),
        col("version"), col("attr_value"))
    val facts = ev
      .where(!col("event_type").isin("signup", "purchase") &&
        col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"))
    graft.plans.NativeAsofJoin.asof(facts, dim, "user_id", "ts",
        Seq("version", "attr_value"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("version"), col("attr_value"))
      .orderBy("event_id")
  }

  private def q36Shape(spark: SparkSession, sfDir: String,
      join: (DataFrame, DataFrame, String, String, Seq[String]) => DataFrame)
      : DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("view_event_id"),
        col("value").as("view_value"))
    join(clicks, views, "user_id", "ts",
      Seq("view_event_id", "view_value"))
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("event_id"), col("view_event_id"), col("view_value"))
      .orderBy("user_id", "ts", "event_id")
  }
}
