package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SuffixQueries

/** Differential test for the native segment-reconstruction expression:
  * [[CutSpans]] (one codegen byte walk) must agree with the interpreted
  * `aggregate`-fold twin it replaced ([[SuffixQueries.survivingFold]])
  * and with a plain-JVM code-point replay — on the LIVE q119 trim
  * relation and on constructed edge cases (spans at the start / to the
  * end / adjacent / whole-doc / past-the-end, multi-byte code points
  * including a surrogate pair). The corpus-wide safety net: q121's
  * oracle md5-checks the exact reconstructed text in DuckDB. */
class CutSpansParitySpec extends SparkSpec {
  import spark.implicits._

  private def withNamedCuts(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("cuts",
      transform(col("cuts"), c => struct(
        c.getField("_1").as("span_start"), c.getField("_2").as("span_end"))))

  /** Plain-JVM replay: keep every code point whose 1-based index lies
    * outside all [start, end) intervals. */
  private def replay(text: String, cuts: Seq[(Long, Long)]): String = {
    val sb = new StringBuilder
    var ch = 1L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (!cuts.exists(c => ch >= c._1 && ch < c._2))
        sb.appendAll(Character.toChars(cp))
      ch += 1
      i += Character.charCount(cp)
    }
    sb.toString
  }

  test("native CutSpans == fold twin == JVM replay on constructed cases") {
    val uni = "héllo wörld ☃ and 𝕏 end"
    val cases: Seq[(String, Seq[(Long, Long)])] = Seq(
      ("abcdefghij", Seq.empty),                 // empty cuts array
      ("abcdefghij", Seq((1L, 4L))),             // span at the start
      ("abcdefghij", Seq((8L, 11L))),            // span to the end
      ("abcdefghij", Seq((1L, 11L))),            // whole doc cut
      ("abcdefghij", Seq((2L, 4L), (4L, 6L))),   // adjacent spans
      ("abcdefghij", Seq((2L, 3L), (5L, 6L), (9L, 10L))), // single chars
      ("abcdefghij", Seq((9L, 99L))),            // span past the end
      ("", Seq((1L, 5L))),                       // empty text
      (uni, Seq((2L, 5L))),                      // cuts the é..o run
      (uni, Seq((7L, 9L), (13L, 14L))),          // cuts ö and the ☃
      (uni, Seq((19L, 20L))),                    // cuts the surrogate pair
      (uni, Seq((1L, 13L), (14L, 19L), (20L, 24L)))) // keeps ☃ and the pair
    val df = withNamedCuts(cases.toDF("text", "cuts"))
      .select(col("text"), col("cuts"),
        CutSpans.of(col("text"), col("cuts")).as("native"),
        SuffixQueries.survivingFold(col("text"), col("cuts")).as("fold"))
      .collect()
    df.zip(cases).foreach { case (r, (text, cuts)) =>
      val expected = replay(text, cuts)
      assert(r.getString(2) === expected, s"native vs replay for '$text'")
      assert(r.getString(3) === expected, s"fold vs replay for '$text'")
    }
    // non-degenerate: the surrogate-pair case really changed the text
    assert(replay(uni, Seq((19L, 20L))) === uni.replace("𝕏", ""))
  }

  test("native == fold twin on the live q119 trim relation") {
    val docs = graft.Tables.documents(spark, sfDir)
    val cuts = SuffixQueries.q119TrimPlan(spark, sfDir)
      .groupBy("doc_id")
      .agg(array_sort(collect_list(
        struct(col("span_start"), col("span_end")))).as("cuts"))
    val rows = docs.select(col("doc_id"), col("text"))
      .join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        SuffixQueries.survivingNative(col("text"), col("cuts")).as("native"),
        SuffixQueries.survivingFold(col("text"), col("cuts")).as("fold"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(1) === r.getString(2),
      s"doc ${r.getLong(0)}"))
  }

  test("q121's plan runs the native expression, no interpreted lambda") {
    val df = SuffixQueries.q121SuffixTrimmed(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cut_spans"), s"cut_spans not in plan:\n$plan")
    assert(!plan.contains("lambdafunction"),
      s"interpreted lambda in q121's plan:\n$plan")
  }

  test("ill-typed cut_spans calls die at ANALYSIS, not execution") {
    for (bad <- Seq(
      "SELECT cut_spans(5, 7)",
      "SELECT cut_spans('abc', array(1L, 2L))",
      "SELECT cut_spans('abc', array(named_struct('a', 1L)))")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(bad).collect())
      assert(e.getMessage.contains("cut_spans expects"), s"$bad: $e")
    }
  }

  test("null elements / null fields inside cuts are skipped, not NPE") {
    // reachable only through the SQL surface (the engine's collect_list
    // producer never emits null elements), so the defense lives in eval
    val nullElem = spark.sql(
      "SELECT cut_spans('abcdefghij', array(" +
        "named_struct('span_start', 2L, 'span_end', 4L), " +
        "CAST(NULL AS STRUCT<span_start: BIGINT, span_end: BIGINT>)))")
      .head().getString(0)
    assert(nullElem === "adefghij")
    val nullField = spark.sql(
      "SELECT cut_spans('abcdefghij', array(" +
        "named_struct('span_start', CAST(NULL AS BIGINT), 'span_end', 4L), " +
        "named_struct('span_start', 6L, 'span_end', 9L)))")
      .head().getString(0)
    assert(nullField === "abcdeij")
    val allNull = spark.sql(
      "SELECT cut_spans('abcdefghij', array(" +
        "CAST(NULL AS STRUCT<span_start: BIGINT, span_end: BIGINT>)))")
      .head().getString(0)
    assert(allNull === "abcdefghij")
  }

  test("unsorted / overlapping cuts throw, never silently drop a span") {
    for (badCuts <- Seq(
      "named_struct('span_start', 5L, 'span_end', 7L), " +
        "named_struct('span_start', 1L, 'span_end', 2L)",  // unsorted
      "named_struct('span_start', 2L, 'span_end', 6L), " +
        "named_struct('span_start', 4L, 'span_end', 8L)",  // overlap
      // an INVERTED middle span must not reset the monotone ends chain
      // and launder the out-of-order third span past validation
      "named_struct('span_start', 5L, 'span_end', 8L), " +
        "named_struct('span_start', 8L, 'span_end', 2L), " +
        "named_struct('span_start', 2L, 'span_end', 4L)")) {
      val e = intercept[Exception](
        spark.sql(s"SELECT cut_spans('abcdefghij', array($badCuts))")
          .collect())
      def rootChain(t: Throwable): Seq[Throwable] =
        t +: Option(t.getCause).toSeq.flatMap(rootChain)
      assert(rootChain(e).exists(t => Option(t.getMessage).exists(m =>
        m.contains("sorted and disjoint") || m.contains("is inverted"))),
        s"expected the sorted-and-disjoint / inverted guard, got: $e")
    }
  }

  test("SQL registration: cut_spans callable from spark.sql") {
    val got = spark.sql(
      "SELECT cut_spans('abcdefghij', array(" +
        "named_struct('span_start', 2L, 'span_end', 4L), " +
        "named_struct('span_start', 6L, 'span_end', 9L)))")
      .head().getString(0)
    assert(got === "adeij")
  }
}
