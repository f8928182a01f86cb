package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Vectors

/** Similarity search over the `embeddings` table (`array<float>` ×64).
  *
  *  - Q17: brute-force cosine top-k for a fixed query set — the exactness
  *    baseline. The query side is tiny and broadcast, so the big side
  *    streams through one scan; cost is O(|queries| × n), never n².
  *  - Q21: cosine near-duplicate pair join (threshold). Quadratic by
  *    definition — kept as the exact reference; the scale path is Q22.
  *  - Q22: SRP-LSH (signed random projections): 8 deterministic
  *    pseudo-random hyperplanes → 8-bit bucket per vector → exact cosine
  *    only within buckets. Candidate generation is a hash-partitioned
  *    equi-join on the bucket id, so at 100 TB it shuffles each vector
  *    once instead of pairing all of them.
  *
  * The reference engine has no vector surface (its only type is the C
  * string, reference mapreduce.h:30-33); this is north-star extension
  * surface. Hyperplane weights derive from md5 parity so the DuckDB oracle
  * rebuilds the exact same planes. SRP-LSH follows Charikar (STOC 2002);
  * the IVF coarse-quantizer layout follows Jégou-Douze-Schmid ("Product
  * quantization for nearest neighbor search", TPAMI 2011) minus the PQ
  * residual codes.
  */
object SimilarityQueries {

  private def vecs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))

  /** Q17: for each query vector (vec_id < 10), the top-10 neighbors by
    * cosine, rank-ordered. Ranking uses the *rounded* similarity with
    * neighbor-id tie-break so the result is hash-deterministic. */
  def q17AnnBrute(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecs(spark, sfDir)
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    broadcast(q).join(e, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosineRounded(col("qv"), col("v")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 10)
      .orderBy("query_id", "rank")
  }

  /** Q21: all near-duplicate pairs with cosine ≥ 0.4 (corpus max ≈ 0.5).
    * Exact quadratic join — the correctness oracle for Q22's LSH path. */
  def q21EmbeddingNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val a = vecs(spark, sfDir)
      .select(col("vec_id").as("vec_id_1"), col("v").as("v1"))
    val b = vecs(spark, sfDir)
      .select(col("vec_id").as("vec_id_2"), col("v").as("v2"))
    a.join(b, col("vec_id_1") < col("vec_id_2"))
      .select(col("vec_id_1"), col("vec_id_2"),
        Vectors.cosineRounded(col("v1"), col("v2")).as("sim"))
      .where(col("sim") >= 0.4)
      .orderBy("vec_id_1", "vec_id_2")
  }

  val NumPlanes = 8
  val Dims      = 64

  /** Deterministic ±1 hyperplanes: weight(p,d) = +1 iff md5("p_d") has an
    * odd low hex word. 8 rows of 64 weights — broadcast to every task. */
  private def planes(spark: SparkSession): DataFrame =
    spark.range(NumPlanes).select(col("id").as("p"))
      .crossJoin(spark.range(Dims).select(col("id").as("d")))
      .select(col("p"), col("d"),
        when(conv(substring(md5(concat(col("p").cast("string"), lit("_"),
          col("d").cast("string"))), 1, 8), 16, 10).cast("long") % 2 === 1,
          lit(1.0)).otherwise(lit(-1.0)).as("w"))
      .groupBy("p")
      .agg(transform(array_sort(collect_list(struct(col("d"), col("w")))),
        x => x("w")).as("wv"))

  /** Bucket assignment: bit p = sign of ⟨v, plane_p⟩; bucket = 8-bit int. */
  def buckets(spark: SparkSession, sfDir: String): DataFrame =
    vecs(spark, sfDir).crossJoin(broadcast(planes(spark)))
      .select(col("vec_id"), col("v"), col("p"),
        (Vectors.dot(col("v"), col("wv")) > 0).as("bit"))
      .groupBy("vec_id")
      .agg(
        sum(when(col("bit"), pow(lit(2.0), col("p")).cast("long"))
          .otherwise(0L)).as("bucket"),
        first(col("v")).as("v"))

  val NumCells = 16
  val NProbe   = 2

  /** IVF (inverted-file) coarse quantizer: the first NumCells vectors act
    * as fixed centroids (deterministic — a production build would run
    * k-means once and broadcast the codebook; the index structure and the
    * query path are identical). Every vector lands in the cell of its
    * most-similar centroid. */
  private def cells(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecs(spark, sfDir)
    val cents = e.where(col("vec_id") < NumCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"))
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cell"),
        Vectors.cosine(col("v"), col("cv")).as("csim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("csim"), asc("cell"))))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("cell"))
  }

  /** Q39: ANN via IVF — queries probe their NProbe nearest cells and rank
    * exact cosine only within those cells. The cell join is a
    * hash-partitioned equi-join on the cell id: each indexed vector
    * shuffles once, queries replicate NProbe times — at 100 TB the scan
    * per query touches NProbe/NumCells of the index instead of all of it. */
  def q39AnnIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecs(spark, sfDir)
    val cents = e.where(col("vec_id") < NumCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"))
    val probes = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("cell"),
        Vectors.cosine(col("qv"), col("cv")).as("csim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("csim"), asc("cell"))))
      .where(col("rk") <= NProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    probes.join(cells(spark, sfDir), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosineRounded(col("qv"), col("v")).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))))
      .where(col("rank") <= 10)
      .orderBy("query_id", "rank")
  }

  /** Q22: approximate near-neighbor pairs — exact cosine evaluated only
    * for bucket-mates, global top-10 by (rounded sim, ids). */
  def q22AnnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val bk = buckets(spark, sfDir)
    val a = bk.select(col("bucket"), col("vec_id").as("vec_id_1"),
      col("v").as("v1"))
    val b = bk.select(col("bucket"), col("vec_id").as("vec_id_2"),
      col("v").as("v2"))
    a.join(b, Seq("bucket"))
      .where(col("vec_id_1") < col("vec_id_2"))
      .select(col("vec_id_1"), col("vec_id_2"),
        Vectors.cosineRounded(col("v1"), col("v2")).as("sim"))
      .orderBy(desc("sim"), asc("vec_id_1"), asc("vec_id_2"))
      .limit(10)
  }
}
