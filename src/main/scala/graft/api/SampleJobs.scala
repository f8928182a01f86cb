package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.Tables

/** The reference's two shipped applications, written against the [[MRJob]]
  * API exactly as a user of the reference would write them against
  * mapreduce.h — tokenizer semantics included (alnum runs, ASCII lowercase,
  * 255-char cap; reference main.c:37-58).
  */
object SampleJobs {

  /** ASCII isalnum — the reference's C-locale token class (main.c:39);
    * deliberately not Unicode isLetterOrDigit (SURVEY.md §7 parity risks). */
  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** The reference Map callback: walk the chunk, emit maximal alnum runs,
    * ASCII-lowercased, capped at 255 chars with overflow dropped
    * (reference main.c:37-58). */
  def tokenize(chunk: String): Iterator[String] = {
    val cs = chunk.toCharArray
    Iterator.unfold(0) { start =>
      var i = start
      while (i < cs.length && !isAlnum(cs(i))) i += 1
      if (i >= cs.length) None
      else {
        var j = i
        while (j < cs.length && isAlnum(cs(j))) j += 1
        // Locale.ROOT: default-locale toLowerCase turns 'I' into dotless
        // ı under tr_TR, silently breaking oracle parity per machine
        Some((new String(cs, i, math.min(j - i, 255))
          .toLowerCase(java.util.Locale.ROOT), j))
      }
    }
  }

  /** Word count (reference mapreduce.h:82-119, the documented contract):
    * map emits (word, "1"); combiner and reducer sum counts. */
  val wordCount: MRJob = MRJob(
    map = (chunk, _) => tokenize(chunk).map(_ -> "1"),
    combine = Some((_, values) => Seq(values.map(_.toLong).sum.toString)),
    reduce = (_, values) => Seq(values.map(_.toLong).sum.toString))

  /** Inverted index (reference main.c:26-140): map emits (word, filename);
    * combiner dedups filenames (main.c:62-81); reducer sorts + dedups and
    * renders `word -> [a, b]` (main.c:124-137). */
  val invertedIndex: MRJob = MRJob(
    map = (chunk, file) => tokenize(chunk).map(_ -> file),
    combine = Some((_, values) => values.distinct),
    reduce = (key, values) =>
      Seq(values.toSeq.distinct.sorted.mkString(s"$key -> [", ", ", "]")))

  /** Driver-checkable query: word count through the full MRJob pipeline
    * over the documents table (doc text = chunk, source = filename). */
  def q28MrWordCount(spark: SparkSession, sfDir: String): DataFrame = {
    val input = Tables.documents(spark, sfDir)
      .select(col("source").as("filename"), col("text").as("chunk"))
    MRJob.run(spark, wordCount, input)
      .toDF("word", "cnt")
      .select(col("word"), col("cnt").cast("long").as("cnt"))
      .orderBy("word")
  }
}
