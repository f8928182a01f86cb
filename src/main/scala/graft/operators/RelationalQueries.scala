package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational extension surface (SURVEY.md §2.11 Q5-Q14): projections,
  * predicates, multi-aggregate groupBy, equi/semi/anti joins, windows,
  * sort+limit, set ops, rollup, time bucketing. All built-ins — Catalyst
  * owns pushdown, join selection and AQE re-planning; no custom nodes.
  *
  * Scale notes (local[32] tests, 1000-executor design):
  *  - dimension joins (region 5, nation 25, customer ~SF*150k) are marked
  *    `broadcast(...)` where the small side is bounded, so the 100 TB fact
  *    scan never shuffles for them;
  *  - fact-fact joins (orders⋈customer at equal SF) are left to sort-merge +
  *    AQE, which co-partitions on the join key — the one unavoidable shuffle;
  *  - every aggregate is partial→final (map-side combine) automatically.
  */
object RelationalQueries {

  /** Q5: filtered revenue sum (TPC-H Q6 shape). Both predicates and the
    * two-column projection push into the parquet scan. */
  def q5FilterAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
             col("l_discount").between(0.05, 0.07))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))

  /** Q6: multi-aggregate groupBy (TPC-H Q1 shape). */
  def q6GroupByAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q7: inner equi-join + agg. customer is the SF-bounded side of an
    * orders fact join → broadcast it; orders aggregates map-side first. */
  def q7JoinAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(round(sum("o_totalprice"), 2).as("total_revenue"),
           count(lit(1)).as("order_cnt"))
      .orderBy("c_mktsegment")

  /** Q8: 3+ table join (TPC-H Q5 shape): revenue per nation name.
    * nation and region are tiny -> broadcast; customer joins orders on
    * custkey (the real shuffle), then dim lookups stay map-side. */
  def q8MultiJoin(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("n_name")

  /** Q9a: left-semi join — customers with at least one order, count/nation.
    * The semi join needs only o_custkey from orders: Spark prunes the scan
    * to one column and aggregates it to distinct keys before the join. */
  def q9Semi(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("customers_with_orders"))
      .orderBy("c_nationkey")

  /** Q9b: left-anti join — customers with no orders, count per nation. */
  def q9Anti(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("customers_without_orders"))
      .orderBy("c_nationkey")

  /** Q10: window ranking — each customer's single biggest order.
    * One shuffle on o_custkey; ties broken by o_orderkey so the row is
    * deterministic. */
  def q10WindowTopOrder(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey")
  }

  /** Q11: global sort + limit → TakeOrderedAndProject (no full sort). */
  def q11TopOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(20)

  /** Q12a: INTERSECT — custkeys present in both orders and customer. */
  def q12Intersect(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(col("o_custkey").as("custkey"))
      .intersect(
        Tables.customer(spark, sfDir).select(col("c_custkey").as("custkey")))
      .orderBy("custkey")

  /** Q12b: EXCEPT — customer custkeys with no orders (anti, set form). */
  def q12Except(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).select(col("c_custkey").as("custkey"))
      .except(
        Tables.orders(spark, sfDir).select(col("o_custkey").as("custkey")))
      .orderBy("custkey")

  /** Q13: rollup revenue by (o_orderpriority, o_orderstatus) with explicit
    * grouping-level flags so the oracle compare is unambiguous on NULLs:
    * the 'ALL' label derives from grouping() — the actual subtotal-row
    * indicator — not from a NULL coalesce, so a genuine NULL (or literal
    * 'ALL') data value can never masquerade as a rollup total row. */
  def q13Rollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .rollup("o_orderpriority", "o_orderstatus")
      .agg(round(sum("o_totalprice"), 2).as("revenue"),
           count(lit(1)).as("cnt"),
           grouping(col("o_orderpriority")).as("gp"),
           grouping(col("o_orderstatus")).as("gs"))
      .select(
        when(col("gp") === 1, lit("ALL"))
          .otherwise(col("o_orderpriority")).as("priority"),
        when(col("gs") === 1, lit("ALL"))
          .otherwise(col("o_orderstatus")).as("status"),
        col("revenue"), col("cnt"))
      // explicit NULLS FIRST (oracle pins NULLS FIRST too): with the
      // grouping()-based labels a genuine NULL data value stays NULL in
      // the output, and Spark (NULLS FIRST asc) vs DuckDB (NULLS LAST
      // asc) would otherwise order such rows differently. Latent on
      // TPC-H's non-null orders columns, pinned anyway.
      .orderBy(asc_nulls_first("priority"), asc_nulls_first("status"))

  /** Q14: batch tumbling window — hourly event buckets. The hour is emitted
    * as a string so Spark/DuckDB timestamp renderings can't diverge. */
  def q14TimeBucket(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour", "event_type")

  /** Q32: JSON scalar extraction over events.props (`{"k": <int>}`):
    * per event_type, stats of the extracted integer. get_json_object is
    * the codegen'd path-extraction built-in (SURVEY.md §2.10). */
  def q32JsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Q33: CUBE over (priority, status) — all four grouping combinations
    * in one pass (partial aggregates expanded once, not four scans).
    * 'ALL' labels via grouping(), q13's discipline. */
  def q33Cube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube("o_orderpriority", "o_orderstatus")
      .agg(round(sum("o_totalprice"), 2).as("revenue"),
           count(lit(1)).as("cnt"),
           grouping(col("o_orderpriority")).as("gp"),
           grouping(col("o_orderstatus")).as("gs"))
      .select(
        when(col("gp") === 1, lit("ALL"))
          .otherwise(col("o_orderpriority")).as("priority"),
        when(col("gs") === 1, lit("ALL"))
          .otherwise(col("o_orderstatus")).as("status"),
        col("revenue"), col("cnt"))
      // explicit NULLS FIRST (oracle pins NULLS FIRST too): with the
      // grouping()-based labels a genuine NULL data value stays NULL in
      // the output, and Spark (NULLS FIRST asc) vs DuckDB (NULLS LAST
      // asc) would otherwise order such rows differently. Latent on
      // TPC-H's non-null orders columns, pinned anyway.
      .orderBy(asc_nulls_first("priority"), asc_nulls_first("status"))

  /** Q34: HyperLogLog++ distinct-count sketch per nation (the sketch the
    * reference could never afford to build exactly at 100 TB: constant
    * memory, one pass, mergeable across partitions). Approximate by
    * nature → no SQL oracle; the spec asserts <5% error vs exact. */
  def q34ApproxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_customers"),
           count(lit(1)).as("order_cnt"))
      .orderBy("c_nationkey")

  /** Q35: analytic windows — per user ordered by time: previous/next event
    * gap and running value sum. One shuffle on user_id serves all three
    * window functions (same partitioning+ordering → one Window exec). */
  def q35WindowAnalytics(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .select(
        col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        (unix_micros(col("ts"))
          - lag(unix_micros(col("ts")), 1).over(w)).as("micros_since_prev"),
        lead(col("event_id"), 1).over(w).as("next_event_id"),
        round(sum(col("value")).over(run), 2).as("running_value"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** Q112: batch sessionization + funnel — the batch twin of q30's
    * streaming `session_window`, extended with conversion semantics the
    * streaming built-in can't express: a session CONVERTS iff it contains
    * a view event at-or-before a click event (`min(view ts) <= max(click
    * ts)`, non-strict — a same-timestamp view+click pair counts). Session
    * rule is q30's exactly: a >= 30-minute gap starts a new session; ties
    * on ts order by event_id for a deterministic lag, and a zero gap can
    * never split a session regardless of tie order.
    *
    * Plan: ONE exchange total. The lag/running-sum windows, the
    * per-session aggregate, and the per-user rollup all cluster on
    * user_id — `HashPartitioning(user_id)` satisfies the (user_id, sess)
    * ClusteredDistribution, so after the window shuffle both aggregates
    * run in place (pinned in OperatorSpec). At 100 TB of events this is
    * the sessionization plan you want: shuffle once on the user key,
    * never materialize per-session rows across the wire. */
  def q112SessionFunnel(spark: SparkSession, sfDir: String): DataFrame =
    sessionFunnelOf(Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id")))

  /** The q112 plan over any (user_id, ts, event_type, event_id)
    * relation — split out so the exact-30-minute boundary (a gap of
    * precisely the threshold STARTS a session, the `>=` rule) is
    * pinnable on constructed timestamps; fixture microsecond noise
    * never lands on the boundary. */
  private[graft] def sessionFunnelOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(w)
    val sessions = events
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .withColumn("new_s",
        when(prev.isNull ||
          col("ts") - prev >= expr("INTERVAL 30 MINUTES"), 1L).otherwise(0L))
      .withColumn("sess", sum(col("new_s")).over(run))
      .groupBy("user_id", "sess")
      .agg(
        count(lit(1)).as("n_ev"),
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        max(when(col("event_type") === "click", col("ts"))).as("last_click"))
    sessions.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).as("n_events"),
        sum(when(col("first_view").isNotNull &&
          col("first_view") <= col("last_click"), 1L).otherwise(0L))
          .as("conv_sessions"))
      .orderBy("user_id")
  }

  /** Q45: pivot — event counts per user with one column per event type.
    * Spark's `pivot` with explicit values compiles to a single pass of
    * conditional aggregates (no per-value scans); explicit value list
    * keeps the schema static and skips the distinct-values pre-query. */
  def q45Pivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      // fill the COUNT columns only: a bare na.fill(0L) also coalesces
      // a null user_id KEY to user 0 (visible as coalesce(user_id, 0)
      // in q150's plan) — latent on this fixture (no null users), wrong
      // on any corpus that has them
      .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
      .orderBy("user_id")

  /** Q150: UNPIVOT (melt) — q45's inverse, the wide→long normalization
    * every feature pipeline needs when a wide metrics table feeds a
    * long-form consumer: the pivoted per-user event-type counts melt
    * back to (user_id, event_type, cnt) rows via the native
    * `Dataset.unpivot` (Spark's melt — a codegen'd Expand, one pass, no
    * shuffle beyond q45's own aggregate). Zero-filled cells are dropped
    * so the round trip is EXACT: the oracle is the direct long-form
    * aggregate, so the hash gate pins pivot∘unpivot == identity on the
    * non-zero support (null user_ids ride through as their own group;
    * ordering pins NULLS FIRST on both engines). */
  def q150Unpivot(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    q45Pivot(spark, sfDir)
      .unpivot(Array(col("user_id")), types.map(col).toArray,
        "event_type", "cnt")
      .where(col("cnt") > 0)
      .orderBy(col("user_id").asc_nulls_first, col("event_type"))
  }

  /** Q46: exact interpolated percentiles per group. `percentile` sorts
    * within each group — exact, unlike the approx_percentile sketch
    * (q34's HLL cousin); both engines use the same linear-interpolation
    * definition, so results are bit-comparable. */
  def q46Percentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"),
        round(min("value"), 4).as("min_v"),
        round(max("value"), 4).as("max_v"))
      .orderBy("event_type")

  /** Q49: sliding event-time windows (1 h size, 15 min slide): each event
    * lands in 4 overlapping windows. `window()` expands rows map-side —
    * the batch twin of the streaming sliding window; at 100 TB the ×4 row
    * amplification happens before the partial aggregate, so the shuffle
    * carries only per-(window, type) partials. */
  def q49SlidingWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** Q51: statistical aggregates — correlation, sample covariance and
    * stddev per return flag. `+ 0.0` after rounding normalizes IEEE
    * negative zero (corr of an uncorrelated group can round to -0.0,
    * which would hash-differ from +0.0). */
  def q51GroupStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        (round(corr("l_quantity", "l_extendedprice"), 3) + 0.0).as("corr_qty_price"),
        (round(covar_samp("l_quantity", "l_extendedprice"), 1) + 0.0).as("covar_qty_price"),
        (round(stddev_samp("l_discount"), 4) + 0.0).as("stddev_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  /** Q62: per-group top-k via the native bounded-heap AGGREGATE
    * ([[graft.functions.TopKAgg]]) instead of a row_number window — each
    * customer's top-3 orders by (totalprice desc, orderkey asc). The
    * window formulation (q10's shape) must shuffle and sort EVERY order
    * row because a window cannot pre-aggregate; the heap aggregate gets
    * map-side partial aggregation, so each map task ships at most k rows
    * per customer — at 100 TB that is shuffling k·|groups| rows instead
    * of the fact table. Direction is encoded in the struct: the negated
    * orderkey ranks ties ascending. Same answer, spec-checked against
    * the window plan and hash-checked against a row_number oracle. */
  def q62TopkAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        struct(col("o_totalprice"), (-col("o_orderkey")).as("neg_key")).as("s"))
      .groupBy("o_custkey")
      .agg(graft.functions.Aggregates.topK(col("s"), 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rk"),
        col("col.o_totalprice").as("o_totalprice"),
        (-col("col.neg_key")).as("o_orderkey"))
      .orderBy("o_custkey", "rk")

  val KmvK = 64

  /** Q63: KMV (k-minimum-values) DISTINCT-COUNT sketch — the
    * deterministic alternative to HLL (q34). Keep each group's k
    * smallest DISTINCT uniform-hash values (TopKAgg in dedup mode over
    * the negated hash); with h_k the k-th smallest of a uniform 60-bit
    * hash, d̂ = (k−1)·2⁶⁰ / h_k (Bar-Yossef et al. 2002; Beyer et al.,
    * SIGMOD'07). Groups holding fewer than k distinct values report
    * their exact count (the standard small-range rule). Because the
    * sketch is the deterministic bottom-k of md5 values, the DuckDB
    * oracle reproduces the ESTIMATE bit-for-bit — a cardinality sketch
    * with a hash-green gate, where HLL gets only a rows-only check.
    * Scale shape: one ObjectHashAggregate, partial→final, ≤ k values
    * per group per task over the wire. */
  def q63KmvDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    Tables.events(spark, sfDir)
      .select(col("event_type"), h.as("h"))
      .groupBy("event_type")
      .agg(graft.functions.Aggregates
        .topKDistinct(struct((-col("h")).as("nh")), KmvK).as("mins"))
      .select(col("event_type"), size(col("mins")).as("sz"),
        // kept set = k smallest h (as largest -h, sorted desc); its LAST
        // element is the k-th smallest h, the KMV threshold
        (-element_at(col("mins"), size(col("mins"))).getField("nh")).as("hk"))
      .select(col("event_type"),
        col("sz").cast("long").as("sketch_size"),
        when(col("sz") < KmvK, col("sz").cast("long"))
          .otherwise(floor(lit((KmvK - 1).toDouble) *
            lit(1152921504606846976.0) / col("hk")).cast("long"))
          .as("est_distinct"))
      .orderBy("event_type")
  }

  /** 2^60 — the KMV hash domain, exact in a double. */
  private[graft] val KmvDomain = 1152921504606846976.0

  /** Q131: KMV SET OPERATIONS — union and intersection cardinality of
    * the per-event-type distinct-user sets straight from their sketches
    * (the Theta-sketch estimators: Beyer et al. SIGMOD'07; Dasgupta et
    * al., DataSketches), WITHOUT a join of the underlying sets. "How
    * many users both clicked and purchased" over 100 TB needs only the
    * two 64-value sketches q63 already maintains: the union sketch is
    * the bottom-k of the merged samples (closed under the same
    * estimator), and the intersection estimate is |{h in both samples :
    * h < theta}| · D/theta with theta = min of the sketches' thresholds
    * (a sketch below k keeps everything, so its theta is the full
    * domain and small ranges come out EXACT — spec-pinned).
    *
    * Scale shape: ONE corpus pass builds every type's sketch
    * (ObjectHashAggregate, ≤ k rows per group per task); all pair
    * algebra below it runs on the ≤ |types|·k-row kept relation —
    * sketch-space, data-free. Everything is deterministic bottom-k of
    * md5 values, so the DuckDB oracle replays every ESTIMATE
    * bit-for-bit (q63's discipline). */
  def q131KmvSetOps(spark: SparkSession, sfDir: String): DataFrame =
    kmvSetOpsOf(Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id")))

  /** The sketch build + pair algebra over an explicit
    * (event_type, user_id) relation — split out so the spec can drive
    * constructed populations through the full-sketch estimator path. */
  private[graft] def kmvSetOpsOf(df: DataFrame): DataFrame = {
    val k = KmvK
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 15),
      16, 10).cast("long")
    val kept = df
      .select(col("event_type"), h.as("h"))
      .groupBy("event_type")
      .agg(graft.functions.Aggregates
        .topKDistinct(struct((-col("h")).as("nh")), k).as("mins"))
      .select(col("event_type"), explode(col("mins")).as("m"))
      .select(col("event_type"), (-col("m.nh")).as("h"))
      .localCheckpoint() // ≤ |types|·k rows; cut the corpus lineage so
                         // the pair algebra below never re-aggregates
    val sk = kept.groupBy("event_type")
      .agg(count(lit(1)).as("sz"), max("h").as("hk"))
    def theta(sz: Column, hk: Column): Column =
      when(sz < k, lit(KmvDomain.toLong)).otherwise(hk)
    val pairs = sk.select(col("event_type").as("type_a"),
        col("sz").as("sz_a"), col("hk").as("hk_a"))
      .crossJoin(sk.select(col("event_type").as("type_b"),
        col("sz").as("sz_b"), col("hk").as("hk_b")))
      .where(col("type_a") < col("type_b"))
      .withColumn("theta",
        least(theta(col("sz_a"), col("hk_a")),
          theta(col("sz_b"), col("hk_b"))))
    val pairKeys = pairs.select("type_a", "type_b")
    // union sketch: bottom-k of the merged kept samples
    val uh = pairKeys
      .join(kept.select(col("event_type").as("type_a"), col("h")), "type_a")
      .select("type_a", "type_b", "h")
      .unionByName(pairKeys
        .join(kept.select(col("event_type").as("type_b"), col("h")), "type_b")
        .select("type_a", "type_b", "h"))
      .distinct()
    val us = uh.withColumn("rn", row_number().over(
        Window.partitionBy("type_a", "type_b").orderBy("h")))
      .where(col("rn") <= k)
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("sz_u"), max("h").as("hk_u"))
    // intersection: common hashes below theta
    val common = kept.select(col("event_type").as("type_a"), col("h"))
      .join(kept.select(col("event_type").as("type_b"), col("h")), Seq("h"))
      .join(pairs.select("type_a", "type_b", "theta"),
        Seq("type_a", "type_b"))
      .where(col("h") < col("theta"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("c"))
    pairs
      .join(us, Seq("type_a", "type_b"))
      .join(common, Seq("type_a", "type_b"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .select(col("type_a"), col("type_b"),
        kmvEst(col("sz_a"), col("hk_a")).as("est_a"),
        kmvEst(col("sz_b"), col("hk_b")).as("est_b"),
        kmvEst(col("sz_u"), col("hk_u")).as("est_union"),
        floor(col("c").cast("double") * lit(KmvDomain) /
          col("theta").cast("double")).cast("long").as("est_inter"))
      .orderBy("type_a", "type_b")
  }

  /** Q132: COHORT RETENTION MATRIX — the product-analytics staple: users
    * are grouped by their first-activity day (the cohort); each
    * (cohort, day-offset) cell counts the distinct cohort members still
    * active that many days later, plus retention as integer permille
    * of the cohort size (integer division, so the oracle is exact).
    *
    * Plan: one user-keyed aggregate derives the cohort (min ts per
    * user), the distinct (user, day) activity joins to it on user_id
    * (both sides already hash-partitioned on user_id — AQE reuses the
    * exchange), and one final aggregate builds the matrix. Distinct
    * counts are per-cell; nothing corpus-sized is ever collected or
    * windowed. At 100 TB this is the standard two-exchange shape; a
    * per-user window over raw events (the naive form) would sort every
    * event row instead of aggregating first. */
  def q132CohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .where(col("user_id").isNotNull && col("ts").isNotNull)
    val cohort = ev.groupBy("user_id")
      .agg(to_date(date_trunc("day", min(col("ts")))).as("cohort"))
    val activity = ev
      .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("day"))
      .distinct()
    val size = cohort.groupBy("cohort")
      .agg(count(lit(1)).as("cohort_size"))
    activity.join(cohort, Seq("user_id"))
      .withColumn("day_offset", expr("datediff(day, cohort)"))
      .groupBy("cohort", "day_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .join(broadcast(size), Seq("cohort"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset").cast("long").as("day_offset"),
        col("n_active"),
        expr("n_active * 1000 DIV cohort_size").as("retention_pm"))
      .orderBy("cohort_day", "day_offset")
  }

  /** The KMV estimate shared by q63/q131/q134: exact below k, else
    * (k-1)·D/h_k — deterministic, oracle-replayable. */
  private def kmvEst(sz: Column, hk: Column): Column =
    when(sz < KmvK, sz.cast("long"))
      .otherwise(floor(lit((KmvK - 1).toDouble) * lit(KmvDomain) / hk)
        .cast("long"))

  /** Q134: SLIDING-WINDOW distinct counts via KMV sketch MERGE — the
    * dashboard shape that makes sketch mergeability pay: per-DAY
    * sketches are built ONCE from one corpus pass, and every 7-day
    * window's distinct-user estimate comes from merging seven 64-value
    * samples (re-taking the bottom-k of their union — the KMV merge is
    * exactly set-union of samples, Beyer et al. SIGMOD'07), never from
    * re-scanning seven days of events. At 100 TB the naive form
    * re-aggregates ~7x the data it needs every day; this form's daily
    * increment is one day's scan plus sketch-space algebra over a
    * |days|·k-row relation. Deterministic bottom-k of md5, so every
    * estimate is hash-gated (q63's discipline). */
  def q134SlidingSketch(spark: SparkSession, sfDir: String): DataFrame =
    slidingSketchOf(Tables.events(spark, sfDir)
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id")))

  /** Daily-sketch build + window merge over an explicit (day, user_id)
    * relation — split out so the spec can drive constructed populations
    * through the full-sketch estimator path. */
  private[graft] def slidingSketchOf(df: DataFrame): DataFrame = {
    val k = KmvK
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 15),
      16, 10).cast("long")
    val kept = df.select(col("day"), h.as("h"))
      .groupBy("day")
      .agg(graft.functions.Aggregates
        .topKDistinct(struct((-col("h")).as("nh")), k).as("mins"))
      .select(col("day"), explode(col("mins")).as("m"))
      .select(col("day"), (-col("m.nh")).as("h"))
      .localCheckpoint() // ≤ |days|·k rows; everything below is
                         // sketch-space, never the corpus
    val windows = kept.select(col("day").as("window_end")).distinct()
    // attach each daily sample to the ≤ 7 window_ends that cover its
    // day (q146's recipe: a codegen'd Generate of constant fanout +
    // broadcast SEMI join on observed days) — the BETWEEN-join
    // formulation planned as a broadcast nested loop evaluating |days|
    // predicates per sketch row, days²·k at dashboard horizons
    val merged = kept
      .select(explode(expr("sequence(day, date_add(day, 6))"))
          .as("window_end"), col("h"))
      .join(broadcast(windows), Seq("window_end"), "left_semi")
      .select("window_end", "h").distinct()
    merged
      .withColumn("rn", row_number().over(
        Window.partitionBy("window_end").orderBy("h")))
      .where(col("rn") <= k)
      .groupBy("window_end")
      .agg(count(lit(1)).as("sz"), max("h").as("hk"))
      .select(date_format(col("window_end"), "yyyy-MM-dd").as("window_end"),
        col("sz").cast("long").as("sketch_size"),
        kmvEst(col("sz"), col("hk")).as("est_active_7d"))
      .orderBy("window_end")
  }

  /** Q141: SLIDING-WINDOW QUANTILES BY SKETCH MERGE — the dashboard
    * shape the mergeable quantile sketch (q123) exists for, finally
    * exercised as a MULTI-SKETCH MERGE: per-day bottom-k sketches of
    * the event value (integer cents, q138's discipline) are built once,
    * PERSISTED as their (hash, value) pair content
    * ([[graft.functions.QuantileSketchAgg]] `emitPairs`), and every
    * 7-day window's p50/p95 comes from re-aggregating the seven daily
    * samples — bottom-k of a union of bottom-k's == bottom-k of the
    * union (the merge-order-invariance theorem QuantileSketchSpec pins;
    * q134's window topology, value-carrying).
    *
    * Scale shape: ONE corpus pass builds the daily sketches
    * (ObjectHashAggregate, ≤ k pairs per day per task); the window
    * algebra below runs on the ≤ |days|·k kept relation — at 100 TB
    * the naive form re-scans ~7× the event volume every day, this form's
    * daily increment is one day's scan plus sketch-space merges.
    * Deterministic bottom-(h,v) of md5, so every estimate hash-checks
    * (the q63/q123 discipline). */
  def q141SlidingQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    slidingQuantilesOf(Tables.events(spark, sfDir)
      .where(col("ts").isNotNull && col("value").isNotNull)
      .select(to_date(col("ts")).as("day"),
        conv(substring(md5(col("event_id").cast("string")), 1, 15),
          16, 10).cast("long").as("h"),
        round(col("value") * 100).cast("long").as("v")))

  /** Daily sketch build + 7-day merge over an explicit (day, h, v)
    * relation — split out so the spec can pin merged-window estimates
    * equal to direct whole-window sketches on constructed data. */
  private[graft] def slidingQuantilesOf(df: DataFrame): DataFrame = {
    val k = SketchK
    val daily = df.groupBy("day")
      .agg(graft.functions.QuantileSketchAgg
        .sketchPairs(col("h"), col("v"), k).as("sk"))
      .select(col("day"), explode(col("sk")).as("p"))
      .select(col("day"), col("p.h").as("h"), col("p.v").as("v"))
      .localCheckpoint() // ≤ |days|·k rows; the merges below are
                         // sketch-space, never the corpus
    val windows = daily.select(col("day").as("window_end")).distinct()
    // q146's explode-to-covering-windows equi form (≤ 7 output rows per
    // sample row, |days|-independent) — never the BETWEEN nested loop
    val merged = daily
      .select(explode(expr("sequence(day, date_add(day, 6))"))
          .as("window_end"), col("h"), col("v"))
      .join(broadcast(windows), Seq("window_end"), "left_semi")
      .groupBy("window_end")
      // the MERGE: the same aggregate over the union of daily samples
      .agg(graft.functions.QuantileSketchAgg
        .sketch(col("h"), col("v"), k).as("sample"))
    merged
      .select(date_format(col("window_end"), "yyyy-MM-dd")
          .as("window_end"),
        explode(typedLit(Seq(50, 95))).as("pct"), col("sample"))
      .select(col("window_end"), col("pct"),
        when(size(col("sample")) > 0,
          element_at(col("sample"),
            expr("CAST((size(sample) * pct + 99) DIV 100 AS INT)")))
          .as("value_cents_est"),
        size(col("sample")).cast("long").as("sample_n"))
      .orderBy("window_end", "pct")
  }

  /** Q147: PRICING SUMMARY — the TPC-H Q1 shape, the most-run report in
    * OLAP benchmarking: per (returnflag, linestatus), quantity / base /
    * discounted / charged totals and averages over the shipped-before
    * window. ONE pass: pushed shipdate filter → map-side partial
    * aggregation → a |flags|×|statuses|-row final exchange; everything
    * whole-stage-codegen.
    *
    * Money discipline (q138's, taken further): quantities are whole
    * units, prices exact CENTS (`round(x·100)`), discount/tax exact
    * integer PERCENT, so the three product sums are exact integers in
    * 1e-2 / 1e-4 / 1e-6 dollar units — a rounded double SUM lands on
    * .005 ties Spark and DuckDB round apart (measured on q138).
    * Averages are integer floor divisions of those sums (identical on
    * both engines for non-negative operands). BIGINT bounds: the
    * charge term is ≤ ~1e11 per row, so the sum stays in range through
    * ~1e7 rows per group (far past these fixtures); at true 100 TB the
    * same plan runs with DECIMAL(38,0) sums — one cast, stated here so
    * nobody scales the BIGINT version silently. */
  def q147PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    // resolved under the pinned SESSION time zone (UTC), matching the
    // oracle's naive TIMESTAMP literal — java.sql.Timestamp.valueOf
    // would parse in the JVM DEFAULT zone and shift the cutoff instant
    // on any non-UTC machine
    val cutoff = to_timestamp(lit("2000-06-01 00:00:00"))
    val qty = round(col("l_quantity")).cast("long")
    val priceC = round(col("l_extendedprice") * 100).cast("long")
    val discP = round(col("l_discount") * 100).cast("long")
    val taxP = round(col("l_tax") * 100).cast("long")
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") <= cutoff)
      .select(col("l_returnflag"), col("l_linestatus"),
        qty.as("q"), priceC.as("pc"), discP.as("dp"), taxP.as("tp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("q")).as("sum_qty"),
        sum(col("pc")).as("sum_base_c"),
        sum(col("pc") * (lit(100L) - col("dp"))).as("sum_disc_e4"),
        sum(col("pc") * (lit(100L) - col("dp")) * (lit(100L) + col("tp")))
          .as("sum_charge_e6"),
        sum(col("dp")).as("sum_disc_p"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty"), col("sum_base_c"), col("sum_disc_e4"),
        col("sum_charge_e6"),
        expr("(sum_qty * 10000) DIV count_order").as("avg_qty_e4"),
        expr("sum_base_c DIV count_order").as("avg_price_c"),
        expr("(sum_disc_p * 100) DIV count_order").as("avg_disc_e4"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Q146: SLIDING-WINDOW TOP-K HEAVY USERS from daily partials — the
    * third member of the window-topology family (q134 merges KMV
    * samples, q141 merges quantile sketches; heavy hitters want EXACT
    * counts, and counts pre-aggregate): per 7-day window ending each
    * day, the 10 most active users with their exact event counts. The
    * window count is the SUM of the user's daily partial counts — the
    * standard materialized daily-rollup pattern — so the window algebra
    * runs on the (day, user) rollup, never a 7× re-scan of events; the
    * per-window top-k is the native bounded-heap aggregate (map-side
    * partials, k rows per task per window). Ties pinned (count desc,
    * user asc) so the output is total-order deterministic and
    * hash-gated.
    *
    * Scale shape: ONE corpus pass builds the daily rollup (|days| ×
    * |active users/day| rows — the relation a 100 TB pipeline already
    * materializes for its dashboards); each rollup row then EXPLODES to
    * the ≤ 7 window_ends that cover its day (a codegen'd Generate — 7
    * output rows per input row, a constant), a broadcast SEMI join on
    * window_end drops the candidates that are not observed days (the
    * windows relation is |days|-sized), and the rest is equi-key
    * aggregation. The earlier formulation joined windows to the rollup
    * on a BETWEEN predicate — a broadcast nested loop evaluating |days|
    * predicates per rollup row; the explode form is |days|-independent
    * per row, and the spec pins the nested loop's absence. */
  def q146SlidingTopUsers(spark: SparkSession, sfDir: String): DataFrame =
    slidingTopUsersOf(Tables.events(spark, sfDir)
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id")))

  /** Daily rollup + window top-k over an explicit (day, user_id)
    * relation — split out so the spec can pin the incremental-append
    * contract (windows ending before a new day never change). */
  private[graft] def slidingTopUsersOf(df: DataFrame): DataFrame = {
    val k = 10
    val daily = df
      .groupBy("day", "user_id")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // rollup-sized; the window algebra below
                         // never touches events again
    val windows = daily.select(col("day").as("window_end")).distinct()
    daily
      .select(explode(expr("sequence(day, date_add(day, 6))"))
          .as("window_end"),
        col("user_id"), col("c"))
      .join(broadcast(windows), Seq("window_end"), "left_semi")
      .groupBy("window_end", "user_id")
      .agg(sum(col("c")).as("events_7d"))
      .groupBy("window_end")
      .agg(graft.functions.Aggregates.topK(
        struct(col("events_7d"), col("user_id")), k,
        asc = Seq(false, true)).as("top"))
      .select(col("window_end"), posexplode(col("top")))
      .select(date_format(col("window_end"), "yyyy-MM-dd").as("window_end"),
        (col("pos") + 1).cast("long").as("rk"),
        col("col.user_id").as("user_id"),
        col("col.events_7d").as("events_7d"))
      .orderBy("window_end", "rk")
  }

  /** Q138: the TPC-H Q10 shape — returned-item revenue report: which
    * customers returned the most revenue in a quarter, with their
    * nation. The classic star-join + aggregate + top-k every warehouse
    * runs: lineitem (facts, returnflag filter pushed to the scan) joins
    * orders (date-range filter pushed) on orderkey, the result joins
    * customer on custkey, nation broadcasts onto it; revenue aggregates
    * per customer and top-20 plans as TakeOrderedAndProject (bounded
    * heaps — never a global sort). At 100 TB the two fact-side joins
    * shuffle on their natural keys once each and AQE handles the
    * post-filter size estimates; the dimension tables ride broadcasts.
    *
    * Numeric discipline: revenue is summed in INTEGER 1e-4 units —
    * price recovered to exact cents, discount to exact percent (both
    * are 2-decimal quantities stored as doubles; round(x·100) recovers
    * the integer identically on both engines) — because a rounded SUM
    * of doubles lands on .005 ties that Spark and DuckDB round apart
    * (measured on this very query: 307843.595 → .60 vs .59). The
    * integer sum is exact, the top-20 cut orders on it, and the
    * display value is one shared division. */
  def q138RevenueReport(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev_e4"))
    val ord = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit(java.sql.Date.valueOf("1996-01-01")) &&
        col("o_orderdate") < lit(java.sql.Date.valueOf("1996-04-01")))
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"))
    val nat = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
        col("c_acctbal"))
      .agg(sum(col("rev_e4")).as("rev_e4"), count(lit(1)).as("n_items"))
      .orderBy(col("rev_e4").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("c_acctbal"),
        (col("rev_e4").cast("double") / 10000.0).as("revenue"),
        col("n_items"))
  }

  /** Q105 knobs, shared with the spec. */
  private[graft] val QuantileBuckets = 256
  private[graft] val QuantileCollectLimit = 100000L

  /** Q105: EXACT global percentiles by iterative histogram bisection —
    * the scale path for what q46's `percentile()` does by buffering
    * every value of a group in executor memory (ObjectHashAggregate):
    * at 100 TB that buffer IS the dataset. Here each round is one
    * groupBy over a monotone bucket index carrying (count, min, max)
    * per bucket — 256 rows to the driver — and the target rank picks
    * the bucket to recurse into; counts are exact per bucket, so float
    * rounding in the bucket boundary arithmetic can narrow slower but
    * never misplace the answer (the recursion range is the bucket's own
    * exact [min, max]). Rounds = log_256(N / collect-limit): THREE
    * scans reach any rank in 10^13 rows with bounded driver state, no
    * sort anywhere, and the first histogram is shared by all requested
    * percentiles (same full range). The final step collects one
    * bucket's values (clamped at [[QuantileCollectLimit]]) and indexes
    * the exact order statistic.
    *
    * Rank contract (pinned by the oracle): percentile p is the
    * ceil(p·N/100)-th smallest value, duplicates counted — integer
    * arithmetic on both sides, no float rank. */
  def q105ExactQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // explicit null AND NaN policy (pinned in the oracle too): ranks are
    // over non-null, non-NaN values — a null would silently fall out of
    // the bisect filters while still counting toward N, shifting every
    // rank; a NaN is worse: isNotNull keeps it, max('value') becomes
    // NaN, every bucket index evaluates to null and the descent dies
    // with an opaque NPE instead of a policy. The numeric domain of the
    // quantile family is finite doubles.
    val values = Tables.events(spark, sfDir).select(col("value"))
      .where(col("value").isNotNull && !isnan(col("value")))
    val pcts = Seq(50, 95, 99)
    val first = values.agg(count(lit(1)), min("value"), max("value")).head
    val n = first.getLong(0)
    require(n > 0, "empty input")
    val (lo0, hi0) = (first.getDouble(1), first.getDouble(2))
    // the full-range histogram — the one round that scans ALL the data —
    // is computed ONCE and every percentile descends from its own bucket
    // of it; without this hoist the most expensive scan would run once
    // per percentile
    val shared =
      if (n > QuantileCollectLimit && lo0 < hi0)
        Some(histogramOf(values, lo0, hi0))
      else None
    val results = pcts.map { p =>
      val target = (n * p + 99) / 100 // ceil(n*p/100), integer-exact
      val v = shared match {
        case Some(hist) =>
          val (r, cum) = pickBucket(hist, target)
          quantileByBisect(
            values.where(col("value") >= r.getDouble(2) &&
              col("value") <= r.getDouble(3)),
            r.getLong(1), r.getDouble(2), r.getDouble(3), target - cum)
        case None => quantileByBisect(values, n, lo0, hi0, target)
      }
      (p, v)
    }
    results.toDF("pct", "value").orderBy("pct")
  }

  /** One 256-bucket (count, min, max) histogram round over [lo, hi] —
    * bucket index is monotone in value, so equal values always share a
    * bucket and per-bucket [min, max] ranges are disjoint. */
  private[graft] def histogramForTest(df: DataFrame, lo: Double,
      hi: Double): Array[org.apache.spark.sql.Row] = histogramOf(df, lo, hi)
  private[graft] def pickBucketForTest(hist: Array[org.apache.spark.sql.Row],
      target: Long): (org.apache.spark.sql.Row, Long) = pickBucket(hist, target)

  private def histogramOf(df: DataFrame, lo: Double,
      hi: Double): Array[org.apache.spark.sql.Row] = {
    val b = QuantileBuckets
    val idx = least(lit(b - 1), greatest(lit(0),
      floor((col("value") - lo) / ((hi - lo) / b)))).cast("int")
    df.groupBy(idx.as("bkt"))
      .agg(count(lit(1)).as("c"), min("value").as("mn"),
        max("value").as("mx"))
      .collect().sortBy(_.getInt(0))
  }

  /** The bucket holding 1-based rank `target`, plus the exact count of
    * values in the buckets before it. */
  private def pickBucket(hist: Array[org.apache.spark.sql.Row],
      target: Long): (org.apache.spark.sql.Row, Long) = {
    var cum = 0L
    for (r <- hist) {
      val c = r.getLong(1)
      if (cum + c >= target) return (r, cum)
      cum += c
    }
    throw new IllegalStateException(s"histogram lost rank $target")
  }

  /** One bisection descent: maintain (range frame, count, exact rank
    * offset below the range); recurse on bucket min/max so the range is
    * always exact data values. */
  private[graft] def quantileByBisect(values: DataFrame, n0: Long,
      lo0: Double, hi0: Double, target0: Long,
      collectLimit: Long = QuantileCollectLimit): Double = {
    var df = values
    var (cnt, lo, hi) = (n0, lo0, hi0)
    var target = target0 // rank within the current frame, 1-based
    while (cnt > collectLimit && lo < hi) {
      val (r, cum) = pickBucket(histogramOf(df, lo, hi), target)
      df = df.where(col("value") >= r.getDouble(2) &&
        col("value") <= r.getDouble(3))
      target -= cum
      cnt = r.getLong(1); lo = r.getDouble(2); hi = r.getDouble(3)
    }
    if (lo == hi) lo
    else {
      val vs = df.collect().map(_.getDouble(0)).sorted
      vs(target.toInt - 1)
    }
  }

  /** Q109: GROUPED exact quantiles — q105's bisection generalized to
    * per-group percentiles with BATCHED rounds: every active
    * (group, pct) frame descends in the SAME job each round (the tiny
    * frame-bounds relation broadcasts onto the values, each row lands in
    * its frames' buckets, one groupBy(group, pct, bucket) serves them
    * all), so the round count is log(N/limit) TOTAL — independent of how
    * many groups there are. The contrast at 100 TB: `percentile()` per
    * group buffers each group's values in one task (the biggest group is
    * the straggler AND the OOM), a window-rank formulation global-sorts
    * within groups; here no value is ever held beyond a 256-row
    * histogram per frame and a clamped final collect. Integer value
    * domain (token counts), so bucket arithmetic is exact division —
    * no float anywhere.
    *
    * The demo: per-language token-count p50/p95 off the docFeatures
    * artifact (the length profile a curation pipeline balances against),
    * rank = ceil(p·N_lang/100), dups counted — same contract as q105. */
  def q109GroupedQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val vals = TextQueries.docFeatures(spark, sfDir)
      .select(col("lang").as("g"), col("token_cnt").cast("long").as("v"))
    groupedQuantiles(vals, Seq(50, 95))
      .toDF("lang", "pct", "token_cnt")
      .orderBy("lang", "pct")
  }

  /** Q123 sample size: ±~3% rank error (1/sqrt(k) scale), and small
    * enough that sampling actually engages above sf0.01 group sizes. */
  private[graft] val SketchK = 256

  /** Q123: grouped quantile ESTIMATES in ONE PASS — the mergeable-sketch
    * complement of q109's exact batched bisection
    * ([[graft.functions.QuantileSketchAgg]]: bottom-k hash-ordered
    * uniform sample, merge-order invariant, deterministic). Same shape
    * as q109 (per-lang token-count p50/p95 off the docFeatures
    * artifact) so the two are directly comparable: q109 pays
    * log(N/limit) full scans for exact ranks; this pays ONE scan and
    * O(k) state per group for estimates within ~1/sqrt(k) rank error —
    * the 100 TB monitoring shape (a dashboard percentile does not
    * need the third scan). The row hash is the q63 md5-prefix
    * construction on doc_id, so the DuckDB oracle REPLAYS the exact
    * sample and the estimates hash-check — the KMV discipline, not
    * approx_percentile's rows-only waiver. `sample_n` pins the sample
    * size itself (= least(group size, k)) on both engines. */
  def q123SketchQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    TextQueries.docFeatures(spark, sfDir)
      .select(col("lang"), h.as("h"), col("token_cnt").cast("long").as("v"))
      .groupBy("lang")
      .agg(graft.functions.QuantileSketchAgg
        .sketch(col("h"), col("v"), SketchK).as("sample"))
      .select(col("lang"), explode(typedLit(Seq(50, 95))).as("pct"),
        col("sample"))
      .select(col("lang"), col("pct"),
        // an all-null group yields an empty sketch; rank 0 would make
        // element_at THROW, so guard to null instead
        when(size(col("sample")) > 0,
          element_at(col("sample"),
            expr("CAST((size(sample) * pct + 99) DIV 100 AS INT)")))
          .as("token_cnt_est"),
        size(col("sample")).cast("long").as("sample_n"))
      .orderBy("lang", "pct")
  }

  private case class QFrame(g: String, pct: Int, lo: Long, hi: Long,
                            cnt: Long, target: Long)

  /** Batched grouped bisection over a (g: string, v: long) relation.
    * Returns (group, pct, exact value at rank ceil(pct·N_g/100)). */
  private[graft] def groupedQuantiles(vals: DataFrame, pcts: Seq[Int],
      collectLimit: Long = QuantileCollectLimit): Seq[(String, Int, Long)] = {
    val spark = vals.sparkSession
    import spark.implicits._
    val init = vals.groupBy("g")
      .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
      .collect()
    var frames = (for {
      r <- init.toSeq; p <- pcts
    } yield QFrame(r.getString(0), p, r.getLong(2), r.getLong(3),
      r.getLong(1), (r.getLong(1) * p + 99) / 100)).toList
    val done = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Long)]
    var splitting = true
    while (splitting) {
      val (resolved, open) = frames.partition(f => f.lo == f.hi)
      done ++= resolved.map(f => (f.g, f.pct, f.lo))
      val (big, small) = open.partition(_.cnt > collectLimit)
      frames = small
      if (big.isEmpty) splitting = false
      else {
        val b = QuantileBuckets
        // bucket width per frame, computed driver-side in BigInt so the
        // full Long domain is safe (hi - lo can exceed Long.Max); the
        // width itself always fits: ceil-ish (range/b + 1) <= 2^58
        def widthOf(lo: Long, hi: Long): Long =
          ((BigInt(hi) - BigInt(lo)) / b + 1).toLong
        val bounds = broadcast(
          big.map(f => (f.g, f.pct, f.lo, f.hi, widthOf(f.lo, f.hi)))
            .toDF("g", "pct", "lo", "hi", "w"))
        // integer bucket index: exact, monotone, equal values never
        // split. Subtraction in DECIMAL(20,0) (exact for any Long pair)
        // and a division-only index — no multiplication anywhere, so no
        // overflow for any value range (the old (v-lo)*b form wrapped
        // past a ~3.6e16 range). idx = (v-lo) DIV w is in [0, b) because
        // range < b*w by construction of w.
        val hist = vals.join(bounds, Seq("g"))
          .where(col("v") >= col("lo") && col("v") <= col("hi"))
          .groupBy(col("g"), col("pct"),
            expr("CAST((CAST(v AS DECIMAL(20,0)) - CAST(lo AS DECIMAL(20,0)))" +
              " DIV CAST(w AS DECIMAL(20,0)) AS INT)").as("bkt"))
          .agg(count(lit(1)).as("c"), min("v").as("mn"), max("v").as("mx"))
          .collect()
          .groupBy(r => (r.getString(0), r.getInt(1)))
        frames = frames ++ big.map { f =>
          val buckets = hist((f.g, f.pct)).sortBy(_.getInt(2))
          var cum = 0L
          var next: QFrame = null
          for (r <- buckets if next == null) {
            val c = r.getLong(3)
            if (cum + c >= f.target)
              next = QFrame(f.g, f.pct, r.getLong(4), r.getLong(5), c,
                f.target - cum)
            else cum += c
          }
          require(next != null, s"lost rank ${f.target} for ${f.g}/${f.pct}")
          next
        }
      }
    }
    // one batched final collect for every remaining small frame
    if (frames.nonEmpty) {
      val bounds = broadcast(
        frames.map(f => (f.g, f.pct, f.lo, f.hi)).toDF("g", "pct", "lo", "hi"))
      val rows = vals.join(bounds, Seq("g"))
        .where(col("v") >= col("lo") && col("v") <= col("hi"))
        .select("g", "pct", "v").collect()
        .groupBy(r => (r.getString(0), r.getInt(1)))
      done ++= frames.map { f =>
        val vs = rows((f.g, f.pct)).map(_.getLong(2)).sorted
        (f.g, f.pct, vs(f.target.toInt - 1))
      }
    }
    done.toSeq
  }

  /** Equi-depth DECILE machinery shared by q139/q140/q148 (one
    * definition so the tie rule cannot drift between them or their
    * oracles): thresholds = the nine exact order statistics at
    * p=10..90 per group, ALL answered in one batched [[groupedQuantiles]]
    * bisection, returned as (lang, ts: array<long>) for a broadcast
    * join. Input columns: (lang, v: long). */
  private[graft] def decileThresholds(vals: DataFrame): DataFrame = {
    val spark = vals.sparkSession
    import spark.implicits._
    groupedQuantiles(vals.select(col("lang").as("g"), col("v")),
        10 to 90 by 10)
      .groupBy(_._1).map { case (g, rows) =>
        (g, rows.sortBy(_._2).map(_._3))
      }.toSeq.toDF("lang", "ts")
  }

  /** The decile id over a row joined to [[decileThresholds]]'s `ts`
    * array: 1 + the count of thresholds STRICTLY below `v` — a value
    * equal to a threshold stays in the lower bucket (the tie rule
    * pinned on both engines), nine codegen'd comparisons, map-side. */
  private[graft] def decileTag(v: Column): Column =
    (1 to 9).map(i => (v > element_at(col("ts"), i)).cast("long"))
      .foldLeft(lit(1L))(_ + _)

  /** Q126: SCD TYPE-2 dimension history (Kimball slowly-changing
    * dimension) — the CDC deliverable every warehouse maintains: each
    * attribute update becomes a VERSIONED row with an effective-time
    * range `[valid_from, valid_to)` and a current flag. Here the
    * "dimension" is the per-user attribute stream carried by signup and
    * purchase events (value = the attribute); version numbers are dense
    * per user in (ts, event_id) order.
    *
    * Plan: one hash exchange on user_id; the two window functions
    * (row_number, lead) and nothing else — at 100 TB this is the
    * standard one-shuffle history build. The INCREMENTAL path is
    * [[scd2Merge]]: applying a later-than-everything delta touches only
    * delta users' current rows (a broadcast-sized join) and windows only
    * the delta — delta-sized work, spec-pinned equal to the full
    * rebuild ([[graft.operators]] OperatorSpec). */
  def q126Scd2(spark: SparkSession, sfDir: String): DataFrame =
    scd2Formatted(scd2Of(scd2Updates(Tables.events(spark, sfDir))))

  /** The q126 presentation (shared with q133's streamed history so the
    * two carry the SAME oracle text): formatted effective-range strings,
    * ordered by (user, version). */
  private[graft] def scd2Formatted(h: DataFrame): DataFrame =
    h.select(col("user_id"), col("version"), col("attr_value"),
        date_format(col("valid_from_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("valid_from"),
        date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("valid_to"),
        col("is_current"))
      .orderBy("user_id", "version")

  /** The attribute-update stream q126 versions (signup/purchase events,
    * value as the tracked attribute). */
  private[graft] def scd2Updates(events: DataFrame): DataFrame =
    events
      .where(col("event_type").isin("signup", "purchase") &&
        col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))

  /** Full SCD2 history build over an update stream
    * (user_id, ts, event_id, value): one row per update with
    * version / valid_from_ts / valid_to_ts / is_current. */
  private[graft] def scd2Of(updates: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    updates
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"),
        col("value").as("attr_value"),
        col("ts").as("valid_from_ts"), col("valid_to_ts"),
        col("valid_to_ts").isNull.as("is_current"))
  }

  /** Incremental SCD2 maintenance: apply `delta` (updates all strictly
    * later than every base row of the same user — the CDC batch
    * contract) to an existing `base` history. Work is delta-sized:
    * the per-user first-new-ts table (|delta users| rows) joins into
    * base to close out current rows, and the window runs over the
    * delta alone; untouched users' rows pass through byte-identical.
    * Result == [[scd2Of]] over the concatenated stream (spec-pinned). */
  private[graft] def scd2Merge(base: DataFrame, delta: DataFrame)
      : DataFrame = {
    val firstNew = delta.groupBy("user_id")
      .agg(min("ts").as("__first_new_ts"))
    val baseV = base.groupBy("user_id").agg(max("version").as("__base_v"))
    val closed = base.join(broadcast(firstNew), Seq("user_id"), "left")
      .withColumn("valid_to_ts",
        when(col("is_current") && col("__first_new_ts").isNotNull,
          col("__first_new_ts")).otherwise(col("valid_to_ts")))
      .withColumn("is_current",
        col("is_current") && col("__first_new_ts").isNull)
      .drop("__first_new_ts")
    val appended = scd2Of(delta)
      .join(broadcast(baseV), Seq("user_id"), "left")
      .withColumn("version",
        col("version") + coalesce(col("__base_v"), lit(0L)))
      .drop("__base_v")
    closed.unionByName(appended.select(closed.columns.map(col): _*))
  }

  /** Q166: recency-decayed engagement score, INTEGER-EXACT — the
    * freshness-weighted per-user signal a curation mixture weighs
    * sources by, with the float EWMA replaced by fixed-point arithmetic
    * so the distributed sum is addition-order independent (the engine's
    * hash-gate discipline): each user's newest ≤32 events score
    * `cents · 2^(31−age)` (age 0 = newest), i.e. exactly the binary
    * EWMA α=1/2 over a 32-event horizon, scaled by 2^31 into longs
    * (cents ≤ ~2^17, 32 terms ≤ 2^5 → max ~2^53, inside long range).
    *
    * Scale shape: the `row_number ≤ 32` filter over the per-user
    * window triggers Spark's WindowGroupLimit pushdown — each map task
    * keeps a 32-row heap per user BEFORE the exchange, so the shuffle
    * carries ≤32·|users| rows, not the corpus (the spec pins the
    * WindowGroupLimit operator in the plan). Ordering ties break on
    * event_id, so the kept set is deterministic. */
  def q166DecayedScore(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      // filter on the RAW row_number (not an expression over it):
      // InferWindowGroupLimit only recognizes rank-column <= k
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 32)
      .withColumn("age", col("rn") - 1)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_recent"),
        sum(col("cents") *
          expr("shiftleft(cast(1 as bigint), cast(31 - age as int))"))
          .as("score"))
      .orderBy("user_id")
  }
}
