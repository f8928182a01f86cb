package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives for the similarity-search surface (embeddings table,
  * `array<float>` columns). Everything is expression-level (zip_with /
  * aggregate / transform) so it stays inside whole-stage codegen — no UDFs,
  * no driver-side math.
  *
  * Determinism note: all reductions run in ascending index order
  * (`aggregate` folds left), so results are bit-identical across engines
  * that also sum sequentially (DuckDB's list_* functions do) — which is what
  * lets the DuckDB oracle hash-match rounded similarity values.
  */
object Vectors {

  /** Cast a float vector to double before any arithmetic: float→double is
    * exact, and both engines then do identical double math. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential left-fold sum of a double array. */
  def arraySum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  /** Dot product in index order. */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x * y))

  /** L2 norm (no sqrt — callers combine under a single sqrt per side). */
  def normSq(v: Column): Column = dot(v, v)

  /** Cosine similarity of two double vectors:
    * dot(a,b) / (sqrt(|a|²) * sqrt(|b|²)). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Cosine rounded for hash-stable oracle comparison. */
  def cosineRounded(a: Column, b: Column, scale: Int = 4): Column =
    round(cosine(a, b), scale)
}
