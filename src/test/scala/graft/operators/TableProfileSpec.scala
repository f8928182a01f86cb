package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The approx profiler twin (q180): same facets as the exact profile,
  * HLL++ distincts within 5% per column, and the multi-count-distinct
  * Expand gone from the plan — the scale shape the q165 scaladoc
  * promises, exercised. */
class TableProfileSpec extends SparkSpec {

  test("profileApprox: every non-distinct metric EQUALS the exact " +
      "profile; distincts are within 5% per column; no Expand in the " +
      "plan") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val exact = TableProfile.profile(spark, li)
    val approx = TableProfile.profileApprox(spark, li)
    // counts, nulls, bounds, facets: identical (only distincts differ)
    val j = exact.alias("e").join(approx.alias("a"), Seq("column"))
      .select(col("column"),
        col("e.facet"), col("a.facet"),
        col("e.n_rows"), col("a.n_rows"),
        col("e.n_nulls"), col("a.n_nulls"),
        col("e.lo"), col("a.lo"), col("e.hi"), col("a.hi"),
        col("e.n_distinct").as("nd_e"), col("a.n_distinct").as("nd_a"))
      .collect()
    assert(j.length === exact.count())
    j.foreach { r =>
      assert(r.get(1) == r.get(2) && r.get(3) == r.get(4) &&
        r.get(5) == r.get(6) && r.get(7) == r.get(8) &&
        r.get(9) == r.get(10),
        s"a non-distinct metric drifted on ${r.getString(0)}: $r")
      val (e, a) = (r.getAs[Long]("nd_e"), r.getAs[Long]("nd_a"))
      assert(math.abs(a - e).toDouble / math.max(e, 1L) < 0.05,
        s"approx distinct off by >5% on ${r.getString(0)}: $a vs $e")
    }
    // the scale claim itself: exact plans an Expand, approx does NOT
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // build the aggregation plans directly (profile() collects —
    // reconstruct the same aggregates through the public surface)
    val exactPlan = planOf(li.agg(
      countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")),
      countDistinct(col("l_returnflag"))))
    val approxPlan = planOf(li.agg(
      approx_count_distinct(col("l_orderkey"), 0.02),
      approx_count_distinct(col("l_partkey"), 0.02),
      approx_count_distinct(col("l_returnflag"), 0.02)))
    assert(exactPlan.contains("Expand"),
      "exact multi-distinct no longer plans an Expand — update the " +
        "q165 scale note")
    assert(!approxPlan.contains("Expand"),
      "approx profile still plans an Expand — the scale swap is broken")
  }
}
