package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.SparkSpec
import graft.operators.DedupQueries

/** Differential test for the native span-gram census: [[SpanGrams]]
  * must agree with the transform/element_at/md5 HOF tree it replaced —
  * per position, both the token and the (nullable) 60-bit gram key —
  * on real corpus rows and on the width edge cases (doc shorter than
  * the span, exactly span-width, one over). The corpus-wide safety net
  * on top of this: every q88/q89/q92/q44/q20/q48 oracle hash derives
  * the identical key in DuckDB from the hex-md5 construction. */
class SpanGramsParitySpec extends SparkSpec {
  import spark.implicits._

  test("native SpanGrams == HOF reference per position") {
    val w = DedupQueries.SpanTokens
    // seeded random docs (the TokenizerParitySpec discipline): small
    // vocab so windows recur, lengths straddling the span width
    val rng = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "dd1", "e", "f2f", "gg", "h")
    val randomDocs = (1 to 60).map { _ =>
      Seq.fill(rng.nextInt(2 * w + 4))(vocab(rng.nextInt(vocab.size)))
        .mkString(" ")
    }
    val synthetic = Seq(
      "",                                  // no tokens -> no row after filter
      "one",                               // shorter than span: all g null
      (1 to w).map(i => s"t$i").mkString(" "),       // exactly one full window
      (1 to w + 1).map(i => s"t$i").mkString(" "),   // two windows
      ("dup " * 40).trim,                  // within-doc repeats share keys
      "Mixed CASE with 123 numbers and punct!!! runs") ++ randomDocs
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("text")).as[String].collect().toSeq ++ synthetic
    val t = Text.tokens(col("text"))
    val rows = docs.toDF("text")
      .where(size(t) >= 1)
      .select(
        Bridge.column(SpanGrams(Bridge.expression(t), w)).as("native"),
        DedupQueries.spanGramsHofReference(t).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val native = r.getSeq[org.apache.spark.sql.Row](0)
      val hof = r.getSeq[org.apache.spark.sql.Row](1)
      assert(native.length === hof.length)
      native.zip(hof).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a.getString(0) === b.getString(0), s"token at pos $i")
        assert((if (a.isNullAt(1)) null else a.getLong(1))
          === (if (b.isNullAt(1)) null else b.getLong(1)),
          s"gram key at pos $i (token ${a.getString(0)})")
      }
    }
    // non-degenerate: some key present, some null tail, some repeat
    val flat = rows.flatMap(_.getSeq[org.apache.spark.sql.Row](0))
    assert(flat.exists(!_.isNullAt(1)))
    assert(flat.exists(_.isNullAt(1)))
  }

  test("the span-feature build plan runs the native expressions") {
    // pin: the census build must carry graft_tokenize + graft_span_grams
    // and no interpreted lambda — a future edit that quietly reverts to
    // the HOF formulation reappears here, not as a silent 3x build cost
    val df = DedupQueries.computeSpanFeatures(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_tokenize"), s"tokenizer not native:\n$plan")
    assert(plan.contains("graft_span_grams"), s"census not native:\n$plan")
    assert(!plan.contains("lambdafunction"),
      s"interpreted lambda in the census build:\n$plan")
  }

  test("graft_span_grams rejects nullable-element arrays and width < 1") {
    // the public SQL surface: a nullable-element array would NPE in the
    // native loop / violate the declared non-null `w` field, and
    // width < 1 would stamp a nonsense empty-gram key on every
    // position — both must fail at analysis, not at runtime
    val nullable = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_span_grams(array('a', NULL, 'b'), 2)").collect()
    }
    assert(nullable.getMessage.toLowerCase.contains("non-null") ||
      nullable.getMessage.toLowerCase.contains("nullable"))
    val zeroWidth = intercept[Exception] {
      spark.sql("SELECT graft_span_grams(graft_tokens('a b c'), 0)").collect()
    }
    assert(zeroWidth.getMessage.contains(">= 1"))
  }

  test("graft_span_grams is SQL-registered with the same semantics") {
    val got = spark.sql(
      "SELECT graft_span_grams(graft_tokens('a b c d e f g h i'), 8) AS s")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(got.length === 9)
    assert(got.take(2).forall(!_.isNullAt(1)), "two full windows expected")
    assert(got.drop(2).forall(_.isNullAt(1)), "tail positions must be null")
    assert(got.map(_.getString(0)) ===
      Seq("a", "b", "c", "d", "e", "f", "g", "h", "i"))
  }
}
