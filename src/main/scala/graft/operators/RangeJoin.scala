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
