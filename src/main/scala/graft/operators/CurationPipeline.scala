package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** End-to-end training-corpus curation — the composed pipeline a user of
  * this engine actually runs over raw documents, chaining the primitive
  * operators in the order every published data-curation stack uses
  * (quality filter → exact dedup → near-dedup):
  *
  *  1. quality gate: q24's score ≥ 0.5 (drops the low-signal tail);
  *  2. exact dedup: keep only each normalized-text group's min-doc_id
  *     representative (q15's rule);
  *  3. near-dedup: drop any stage-2 survivor whose MinHash est_jaccard
  *     ≥ 0.5 partner with a lower doc_id also survived stage 2 (greedy by
  *     id — one pass over the q18 candidate pairs, no transitive
  *     chaining, so the result is deterministic and oracle-expressible).
  *
  * Every stage reuses the already-verified primitive (q24/q15/q18); the
  * pipeline is one plan — Catalyst sees through the composition, and the
  * only shuffles are the ones the primitives already need.
  */
object CurationPipeline {

  /** Q50: the surviving corpus with its quality metadata. */
  def q50CorpusCuration(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        Text.normalized(col("text")).as("norm"),
        size(col("toks")).as("token_cnt"),
        TextQueries.qualityScore(col("text"), col("toks")).as("quality"))
    // stage 1+2: quality gate, then the exact-dup representative
    val reps = docs
      .where(col("quality") >= 0.5)
      .withColumn("keep_id", min("doc_id")
        .over(org.apache.spark.sql.expressions.Window.partitionBy("norm")))
      .where(col("doc_id") === col("keep_id"))
      .select("doc_id", "token_cnt", "quality")
    // stage 3: greedy near-dedup — drop a survivor with a lower-id
    // near-duplicate survivor (left-anti against the candidate pairs)
    val nearPairs = DedupQueries.q18MinhashLsh(spark, sfDir)
      .where(col("est_jaccard") >= 0.5)
    val dropped = nearPairs
      .join(reps.select(col("doc_id").as("doc_id_1")), "doc_id_1")
      .select(col("doc_id_2").as("doc_id"))
    reps.join(dropped, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }
}
