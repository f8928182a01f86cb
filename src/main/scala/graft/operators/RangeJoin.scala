package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bucketized range join — the scalable form of `a.ts BETWEEN b.ts AND
  * b.ts + w`, which Spark would otherwise plan as a broadcast
  * nested-loop join (O(n·m) comparisons and a broadcast of a whole side).
  *
  * Standard decomposition: quantize time into `width`-sized buckets; a
  * probe row in bucket b can only match build rows in buckets {b-1, b}
  * (for a window reaching back `width`), so replicate each probe row into
  * those buckets, hash-join on the bucket id, and refine with the exact
  * range predicate. Shuffle volume is 2× probe + 1× build — independent
  * of the match count — and the join parallelizes like any equi-join.
  * (This is how Databricks' range-join hint and Flink interval joins
  * work internally.)
  */
object RangeJoin {

  /** Probe rows matched to build rows with `build.ts` in
    * (probe.ts - window, probe.ts]; both inputs need a `ts` timestamp
    * column named by `ts`/`buildTs`. `windowMicros` must be positive. */
  def rangeJoin(probe: DataFrame, build: DataFrame, ts: String,
                buildTs: String, windowMicros: Long): DataFrame = {
    val b = unix_micros(col(buildTs))
    val p = unix_micros(col(ts))
    val buildB = build.withColumn("__bucket", (b / windowMicros).cast("long"))
    val probeB = probe
      .withColumn("__bucket",
        explode(array((p / windowMicros).cast("long"),
          (p / windowMicros).cast("long") - 1)))
    probeB.join(buildB, Seq("__bucket"))
      .where(unix_micros(col(buildTs)) > unix_micros(col(ts)) - windowMicros &&
             unix_micros(col(buildTs)) <= unix_micros(col(ts)))
      .drop("__bucket")
  }

  /** Q149: INTERVAL-OVERLAP self-join — the range-join variant q40
    * leaves open: both sides are VARIABLE-length intervals (q40's probe
    * is a point with a fixed trailing window). The workload is session
    * concurrency — for every user session (q112's 30-minute-gap rule,
    * interval = [first event, last event]), how many OTHER users'
    * sessions overlap it in time ("who was online together"), the
    * capacity/abuse signal a product pipeline computes daily.
    *
    * Scale shape: the naive theta join (`s_a <= e_b AND s_b <= e_a`)
    * plans as a nested-loop cross product — dead at any scale. The
    * bucketized form replicates each interval to every hour bucket it
    * COVERS (variable fanout = span/width + 1, vs q40's constant 2),
    * equi-joins on the bucket, dedups candidate pairs (an overlapping
    * pair shares every bucket of its overlap), and refines with the
    * exact predicate. Hot buckets (peak hours) go quadratic exactly as
    * far as their sessions genuinely pairwise overlap — that cost lives
    * in the OUTPUT, not the method; width is the balance knob. Zero-
    * overlap sessions are restored by a left join (reported with 0). */
  def q149ConcurrentSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val width = 3600L * 1000000L // 1-hour buckets, microseconds
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val prev = lag(col("ts"), 1).over(w)
    val iv = Tables.events(spark, sfDir)
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("new_s",
        when(prev.isNull ||
          col("ts") - prev >= expr("INTERVAL 30 MINUTES"), 1L).otherwise(0L))
      .withColumn("sess", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess")
      .agg(min(col("ts")).as("s_ts"), max(col("ts")).as("e_ts"))
      .select(col("user_id"), col("sess"), col("s_ts"),
        unix_micros(col("s_ts")).as("s"), unix_micros(col("e_ts")).as("e"))
      .localCheckpoint() // sessions-sized, referenced THREE times (both
                         // join sides + the restore join) — without the
                         // cut, the events window re-executes per use
    val binned = iv.withColumn("__bucket",
      explode(sequence((col("s") / width).cast("long"),
        (col("e") / width).cast("long"))))
    val a = binned.select(col("__bucket"), col("user_id").as("ua"),
      col("sess").as("sa"), col("s_ts").as("st_a"),
      col("s").as("s_a"), col("e").as("e_a"))
    val b = binned.select(col("__bucket"), col("user_id").as("ub"),
      col("sess").as("sb"), col("s").as("s_b"), col("e").as("e_b"))
    val pairs = a.join(b, Seq("__bucket"))
      .where(col("ua") =!= col("ub") &&
        col("s_a") <= col("e_b") && col("s_b") <= col("e_a"))
      .select("ua", "sa", "st_a", "ub", "sb")
      .distinct() // a pair shares every bucket of its overlap
    val counts = pairs.groupBy("ua", "sa", "st_a")
      .agg(count(lit(1)).as("n_concurrent"))
    iv.join(counts,
        col("user_id") === col("ua") && col("sess") === col("sa"), "left")
      .select(col("user_id"),
        date_format(col("s_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("session_start"),
        coalesce(col("n_concurrent"), lit(0L)).as("n_concurrent"))
      .orderBy("user_id", "session_start")
  }

  /** Q40: for each error event, how many click events (any user) happened
    * in the preceding minute, and their summed value. Left join semantics:
    * errors with no clicks keep cnt = 0. */
  def q40RangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id"), col("ts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("ts").as("click_ts"), col("value").as("click_value"))
    rangeJoin(errors, clicks, "ts", "click_ts", 60L * 1000000L)
      .groupBy("event_id")
      .agg(count(lit(1)).as("clicks_before"),
        round(sum("click_value"), 2).as("click_value_sum"))
      // left semantics: restore errors that matched no clicks
      .join(errors.select("event_id"), Seq("event_id"), "right_outer")
      .na.fill(0L, Seq("clicks_before"))
      .na.fill(0.0, Seq("click_value_sum"))
      .orderBy("event_id")
  }
}
