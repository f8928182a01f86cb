package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** The reference's own query surface re-expressed Spark-first.
  *
  * Q1 word count  — documented workload contract (reference mapreduce.h:82-119)
  * Q2 inverted index — the flagship end-to-end query (reference main.c:26-140)
  * Q3 global distinct-token count — oracle "Unique words" stat
  *                  (reference SimpleInvertedIndex/inverted_index.c:187)
  * Q4 top-k words — metrics top-10 tables (reference metrics.c:365-421)
  *
  * All are a scan → flatMap(tokens) → groupBy pipeline. Spark executes this as
  * FileScan(parquet, pruned to `text`/`source`) → Generate(explode) → partial
  * HashAggregate → Exchange(hash by word) → final HashAggregate, i.e. the
  * reference's mapper-buffer + combiner + shuffle + reduce (buffer.c:88-235)
  * fall out of one declarative plan. The partial aggregate IS the combiner:
  * at 100 TB the map-side combine is what keeps the token shuffle ~83% smaller
  * (the reference measured exactly that, README.md:319).
  */
object ReferenceQueries {

  /** One row per (token, source doc). The common prefix of Q1-Q4. */
  private def tokenized(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(Text.explodedTokens(col("text")).as("word"), col("source"))

  /** Q1: word → count, ordered by word. */
  def q1WordCount(spark: SparkSession, sfDir: String): DataFrame =
    tokenized(spark, sfDir)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** Q2: word → rendered sorted distinct source list, byte-compatible with the
    * reference's `word -> [a, b]` record format (main.c:133-137). collect_set
    * dedups map-side (the reference's combiner, main.c:62-81); array_sort
    * reproduces the reducer's qsort+unique (main.c:100-131). */
  def q2InvertedIndex(spark: SparkSession, sfDir: String): DataFrame =
    tokenized(spark, sfDir)
      .groupBy("word")
      .agg(array_sort(collect_set(col("source"))).as("sources"))
      .select(
        col("word"),
        concat(col("word"), lit(" -> ["),
          array_join(col("sources"), ", "), lit("]")).as("line"))
      .orderBy("word")

  /** Q3: global distinct-token count (single row). Partial distinct happens
    * map-side; only distinct words shuffle. */
  def q3DistinctTokens(spark: SparkSession, sfDir: String): DataFrame =
    tokenized(spark, sfDir)
      .agg(count_distinct(col("word")).as("unique_words"))

  /** Q4: top 10 words by count desc, word asc. Spark plans orderBy+limit as
    * TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    * driver, no global sort even at 100 TB. */
  def q4TopWords(spark: SparkSession, sfDir: String): DataFrame =
    q1WordCount(spark, sfDir)
      .orderBy(desc("cnt"), asc("word"))
      .limit(10)

  /** Q101's benchmark phrase set (mixed lengths on purpose — the plan is
    * generic over phrase length). Single source of truth: the DuckDB
    * oracle's join chain is generated from this same list. */
  val PhraseSet: Seq[String] = Seq(
    "big order scan", "window fast query", "stream table hash",
    "table table")

  /** Q101: phrase search over the POSITIONAL inverted index — the natural
    * extension of the reference's flagship query (its index maps word →
    * source files, main.c:26-140; a positional index maps word → (doc,
    * position), which is what phrase/adjacency retrieval needs).
    *
    * Zero joins: the [[graft.operators.DedupQueries.spanFeatures]]
    * artifact IS the positional index (doc_id, pos, w), so a phrase scan
    * is (1) a pushed `w IN (terms)` filter over the bucketed artifact —
    * only the phrase vocabulary's postings are ever read — and (2) ONE
    * per-doc window computing `lead(w, i)`/`lead(pos, i)`: the phrase
    * matches at `pos` iff the next i-th FILTERED row sits exactly at
    * `pos + i` and carries the i-th term. Integer positions make that
    * sound with the union vocabulary of all phrases: no filtered row can
    * sit strictly between adjacent positions, so `lead` cannot skip a
    * would-be match. Every phrase is answered by the same single
    * scan+window (the multi-query trick of a production phrase scanner);
    * a k-way position self-join — the textbook plan — would shuffle the
    * postings k times instead.
    */
  def q101PhraseSearch(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val phrases = PhraseSet.map(_.split(" ").toSeq)
    val terms = phrases.flatten.distinct
    val maxK = phrases.map(_.length).max
    val post = DedupQueries.spanFeatures(spark, sfDir)
      .select(col("doc_id"), col("pos"), col("w"))
      .where(col("w").isin(terms: _*))
    val win = Window.partitionBy("doc_id").orderBy("pos")
    val leads = post.select(
      Seq(col("doc_id"), col("pos"), col("w")) ++
        (1 until maxK).flatMap(i => Seq(
          lead("w", i).over(win).as(s"w$i"),
          lead("pos", i).over(win).as(s"p$i"))): _*)
    val matchTags = phrases.map { ts =>
      val pred = ts.zipWithIndex.map { case (t, i) =>
        if (i == 0) col("w") === t
        else col(s"w$i") === t && col(s"p$i") === col("pos") + i
      }.reduce(_ && _)
      when(pred, lit(ts.mkString(" ")))
    }
    leads
      .select(col("doc_id"), col("pos"),
        explode(array_compact(array(matchTags: _*))).as("phrase"))
      .groupBy("phrase", "doc_id")
      .agg(count(lit(1)).as("occurrences"), min("pos").as("first_pos"))
      .orderBy("phrase", "doc_id")
  }
}
