package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential test for the native shingle builder: [[WordShingles]]
  * must agree with BOTH prior formulations it replaced — the array HOF
  * (transform/slice/array_join, element order included) and the
  * window-realignment row formulation (set semantics per doc) — on real
  * corpus rows and the edge cases (empty doc, shorter-than-n,
  * exactly-n, repeat-heavy). The corpus-wide safety net on top: every
  * shingle-consumer oracle hash (q18/q19/q50/q52/q64/q66/q67/q80/q83)
  * derives the same shingle set in DuckDB. */
class WordShinglesParitySpec extends SparkSpec {
  import spark.implicits._

  private def testDocs: Seq[String] = {
    val rng = new scala.util.Random(1337)
    val vocab = Vector("a", "bb", "ccc", "dd1", "e", "f2f", "gg", "h")
    val randomDocs = (1 to 60).map { _ =>
      Seq.fill(rng.nextInt(10))(vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    val synthetic = Seq(
      "",                       // no tokens -> the empty-string shingle
      "only",                   // 1 token < n: whole sequence, one shingle
      "two words",              // 2 tokens < n
      "exactly three tokens",   // exactly one full window
      "now four total tokens",  // two windows
      ("dup dup dup " * 10).trim, // heavy repeats collapse
      "Mixed CASE with 123 numbers and punct!!! runs")
    val corpus = graft.Tables.documents(spark, sfDir)
      .select(col("text")).as[String].collect().toSeq
    corpus ++ synthetic ++ randomDocs
  }

  test("native WordShingles == HOF array reference, order included") {
    val rows = testDocs.toDF("text")
      .select(Text.wordShingles(col("text"), 3).as("native"),
        Text.wordShinglesHofReference(col("text"), 3).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }

  test("native shingleRows == window-formulation reference, per doc set") {
    val docs = testDocs.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def sets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val native = sets(Text.shingleRows(docs, "doc_id", "text", 3))
    val window = sets(Text.shingleRowsWindowReference(docs, "doc_id", "text", 3))
    assert(native === window)
    // non-degenerate: an empty-string shingle doc and a multi-shingle doc
    assert(native.values.exists(_ === Set("")))
    assert(native.values.exists(_.size > 3))
  }

  test("the shingle build plan is exchange-free and runs the native expressions") {
    // THE point of the expression: shingling is per-document, so the
    // build must be scan -> project -> generate with no Exchange and no
    // Window (the old formulation shuffled the token corpus on doc_id);
    // a future edit that reintroduces either reappears here
    val df = Text.shingleRows(
      graft.Tables.documents(spark, sfDir), "doc_id", "text", 3)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_tokenize"), s"tokenizer not native:\n$plan")
    assert(plan.contains("graft_word_shingles"), s"shingles not native:\n$plan")
    assert(!plan.contains("Exchange"), s"shingle build shuffles:\n$plan")
    assert(!plan.contains("Window"), s"shingle build has a window:\n$plan")
    assert(!plan.contains("lambdafunction"),
      s"interpreted lambda in the shingle build:\n$plan")
  }

  test("graft_word_shingles is SQL-registered with the same semantics") {
    val got = spark.sql(
      "SELECT graft_word_shingles(graft_tokens('a b a b c'), 2) AS s")
      .head().getSeq[String](0)
    assert(got === Seq("a b", "b a", "b c")) // first-occurrence order
    assert(spark.sql("SELECT graft_word_shingles(graft_tokens(''), 3) AS s")
      .head().getSeq[String](0) === Seq(""))
    val zeroN = intercept[Exception] {
      spark.sql("SELECT graft_word_shingles(graft_tokens('a b'), 0)").collect()
    }
    assert(zeroN.getMessage.contains(">= 1"))
    val nullable = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_word_shingles(array('a', NULL), 2)").collect()
    }
    assert(nullable.getMessage.toLowerCase.contains("non-null") ||
      nullable.getMessage.toLowerCase.contains("nullable"))
  }
}
