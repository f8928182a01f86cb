package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String): Seq[String] =
    Seq(s).toDF("text").select(Text.tokens(col("text")).as("t"))
      .collect().head.getSeq[String](0)

  test("tokens: maximal alnum runs, lowercased, empties dropped") {
    assert(toks("Hello,  WORLD!! 42x") === Seq("hello", "world", "42x"))
  }

  test("tokens: empty / all-delimiter input yields no tokens") {
    assert(toks("") === Seq.empty)
    assert(toks("!?.,;: --- ") === Seq.empty)
  }

  test("tokens: 255-char cap drops overflow (reference main.c:42-44)") {
    val long = "a" * 300
    assert(toks(s"x $long y") === Seq("x", "a" * 255, "y"))
  }

  test("tokens: non-ASCII characters are delimiters (ASCII-only parity)") {
    // 'é' is not in [a-z0-9], so it splits the run — documented behavior
    assert(toks("café bar") === Seq("caf", "bar"))
  }

  test("normalized collapses non-alnum runs to single spaces") {
    val df = Seq("  Hello,,, WORLD--now  ").toDF("text")
      .select(Text.normalized(col("text")).as("n"))
    assert(df.collect().head.getString(0) === "hello world now")
  }

  test("wordShingles: n consecutive tokens; short docs yield one shingle") {
    def sh(s: String): Seq[String] =
      Seq(s).toDF("text").select(Text.wordShingles(col("text"), 3).as("s"))
        .collect().head.getSeq[String](0)
    assert(sh("a b c d") === Seq("a b c", "b c d"))
    assert(sh("a b") === Seq("a b")) // shorter than n: the whole doc
    assert(sh("x x x x") === Seq("x x x")) // distinct
  }

  test("charShingles: sliding char n-grams over normalized text") {
    val df = Seq("ab cd").toDF("text")
      .select(Text.charShingles(col("text"), 3).as("s"))
    assert(df.collect().head.getSeq[String](0) === Seq("ab ", "b c", " cd"))
  }
}
