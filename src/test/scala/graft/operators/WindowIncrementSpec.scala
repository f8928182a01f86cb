package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incremental-append contract behind the sliding-window family's
  * scale claims (q134/q141/q146 all say "the daily increment is one
  * day's scan"): appending day d touches ONLY the windows containing d
  * — every window ending strictly before d is byte-identical to what
  * it was before the append, so a maintenance job recomputes at most
  * the last 7 windows' merge stages and never re-reads history. Pinned
  * here for the quantile-sketch merge (q141) and the exact-count top-k
  * (q146) over constructed data; q134's KMV merge shares q141's
  * topology verbatim. */
class WindowIncrementSpec extends SparkSpec {

  private val hashCol =
    conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
      .cast("long")

  test("q141: windows ending before an appended day are unchanged") {
    import spark.implicits._
    val rnd = new scala.util.Random(4601)
    val rows = for { d <- 1 to 15; i <- 1 to 400 } yield
      (java.sql.Date.valueOf(f"2024-05-$d%02d"),
        d * 100000L + i, rnd.nextInt(50000).toLong)
    def base(until: Int) = rows.filter(_._1.toLocalDate.getDayOfMonth <= until)
      .toDF("day", "id", "v")
      .select(col("day"), hashCol.as("h"), col("v"))
    def result(until: Int) = RelationalQueries
      .slidingQuantilesOf(base(until)).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val before = result(14)
    val after = result(15)
    // the appended day creates exactly one new window ...
    assert(after.keySet.map(_._1) === before.keySet.map(_._1) + "2024-05-15")
    // ... and every prior window is UNTOUCHED
    before.foreach { case (key, v) =>
      assert(after(key) === v, s"window $key changed by the append")
    }
  }

  test("q146: windows ending before an appended day are unchanged") {
    import spark.implicits._
    val rnd = new scala.util.Random(4602)
    val rows = for { d <- 1 to 15; i <- 1 to 400 } yield
      (java.sql.Date.valueOf(f"2024-05-$d%02d"), rnd.nextInt(40).toLong)
    def result(until: Int) = RelationalQueries
      .slidingTopUsersOf(rows
        .filter(_._1.toLocalDate.getDayOfMonth <= until)
        .toDF("day", "user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val before = result(14)
    val after = result(15)
    assert(after.keySet.map(_._1) === before.keySet.map(_._1) + "2024-05-15")
    before.foreach { case (key, v) =>
      assert(after(key) === v, s"window $key changed by the append")
    }
  }

  test("q134/q141 plan: the sample-to-windows attach is the explode " +
      "equi form — never the BETWEEN broadcast nested loop") {
    // the q146 pin extended to its two sketch-space siblings: a BETWEEN
    // join plans as a BroadcastNestedLoopJoin evaluating |days|
    // predicates per sketch row (days²·k at dashboard horizons); the
    // explode form is a codegen'd Generate of ≤ 7 rows per sample,
    // |days|-independent
    val sfDir = "/root/testdata/sf0.01"
    for ((name, df) <- Seq(
      "q134" -> RelationalQueries.q134SlidingSketch(spark, sfDir),
      "q141" -> RelationalQueries.q141SlidingQuantiles(spark, sfDir))) {
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"$name window attach fell back to a nested loop:\n${plan.take(3000)}")
      assert(plan.contains("Generate explode"),
        s"$name must fan via explode(sequence):\n${plan.take(3000)}")
    }
  }
}
