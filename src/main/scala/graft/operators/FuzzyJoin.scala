package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SOUND edit-distance similarity join (fuzzy join) via symmetric-delete
  * blocking — the FastSS / SymSpell construction (Bocek et al., "Fast
  * Similarity Search in Large Dictionaries", 2007).
  *
  * The engine already ships a RECALL-LIMITED edit-distance pass (q47:
  * Levenshtein over MinHash/LSH candidates — misses any pair LSH misses).
  * This operator is the exact complement: for distance d, every string
  * emits its d-deletion neighborhood (itself plus every string reachable
  * by deleting up to d characters); by pigeonhole, ed(a,b) <= d implies
  * the neighborhoods intersect (a substitution is one deletion on each
  * side at the same spot; an insertion/deletion is one deletion on the
  * longer side), so an EQUI-join on neighborhood members yields a
  * candidate superset, and one Levenshtein evaluation per distinct
  * candidate pair removes the false positives (sharing a variant does
  * not bound the distance: "ab" and "ba" share the variant "a").
  *
  * Scale shape (the reason this beats the naive theta-join): the
  * quadratic `levenshtein(a,b) <= d` cross join is dead on arrival at
  * any scale; here each row fans out to `1 + len` variant rows at d=1
  * (len+1 choose 2 more at d=2), the join key is the 8-byte xxhash64 of
  * the variant (hash collisions only ADD candidates — the verify step
  * owns exactness), and the shuffle carries n*(len+1) narrow rows. Hot
  * variants (shared by a large near-identical cluster) bound the fanout
  * exactly as a self-join on the cluster does — that quadratic lives in
  * the OUTPUT, not the method; the per-variant group size is the salt
  * knob if a corpus ever needs one. The verify cost is one O(len^2) DP
  * per distinct candidate pair, map-side after the candidate dedup.
  *
  * Deliverable (q124): per-part fuzzy-duplicate degree over `p_name` at
  * d=1 — partner count and canonical (smallest-key) partner — the
  * record-linkage summary a catalog-curation pipeline keys on.
  */
object FuzzyJoin {

  /** The d=1 deletion neighborhood of `s`, distinct members only (deleting
    * either of two equal adjacent characters yields the same string).
    * Spark HOFs are CodegenFallback (no codegen) — acceptable here
    * because variant generation runs over the DIMENSION-sized name
    * relation, never a fact table; a native expression is the upgrade
    * path if a corpus-sized caller appears (TokenizeExpression precedent). */
  private[operators] def deletionVariants(s: Column): Column =
    array_union(
      array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, length(s) - i))))

  /** The UP-TO-2-deletion neighborhood of `s`, distinct members only:
    * itself, every 1-deletion, and every 2-deletion (delete positions
    * i < j — generated as the three substr segments around them).
    * Completeness at d=2 is Bocek et al. §3's pigeonhole re-run: each
    * of the ≤2 edit operations is resolved by at most one deletion on
    * each side at the operation's position (substitution → one deletion
    * per side; insertion/deletion → one on the longer side; a
    * transposition is two substitutions under plain Levenshtein), so
    * ed(a,b) ≤ 2 implies the ≤2-deletion neighborhoods intersect —
    * spec-pinned by the brute-force differential and the variant-COUNT
    * contract (1 + n + n·(n−1)/2 before dedup). Guards: the outer range
    * needs len ≥ 2 (Spark's `sequence(2, 1)` runs DESCENDING, it does
    * not return empty — the `when` is load-bearing); the inner
    * `sequence(i+1, len)` is always ascending because i ≤ len−1. */
  private[operators] def deletionVariants2(s: Column): Column = {
    val del2 = when(length(s) >= 2,
      flatten(transform(sequence(lit(1), length(s) - 1),
        i => transform(sequence(i + 1, length(s)),
          j => concat(
            s.substr(lit(1), i - 1),
            s.substr(i + 1, j - i - 1),
            s.substr(j + 1, length(s) - j))))))
      .otherwise(array().cast("array<string>"))
    array_distinct(concat(deletionVariants(s), del2))
  }

  /** Per-row fuzzy-duplicate summary of `names` (columns: key, name) at
    * edit distance <= d (d ∈ {1, 2}): (key, name, n_fuzzy, min_partner).
    * Rows with no partner report n_fuzzy = 0, min_partner null. Split
    * out so specs can feed constructed names (the "ab"/"ba"
    * false-positive case at d=1; the transposition/substitution
    * completeness cases at d=2). */
  private[graft] def fuzzyDegreeOf(names: DataFrame, d: Int = 1): DataFrame = {
    require(d == 1 || d == 2, s"fuzzyDegreeOf supports d in {1, 2}: $d")
    val neighborhood =
      if (d == 1) deletionVariants(col("name"))
      else deletionVariants2(col("name"))
    val v = names
      .select(col("key"), col("name"),
        explode(neighborhood).as("variant"))
      .select(col("key"), col("name"), xxhash64(col("variant")).as("vh"))
      .distinct()
    // candidates: strings sharing a variant hash, each unordered pair once
    val cand = v.as("a").join(v.as("b"),
        col("a.vh") === col("b.vh") && col("a.key") < col("b.key"))
      .select(col("a.key").as("ka"), col("a.name").as("na"),
        col("b.key").as("kb"), col("b.name").as("nb"))
      .distinct()
    val pairs = cand.where(levenshtein(col("na"), col("nb")) <= d)
    // symmetric per-key rollup: each verified pair counts for both ends
    val partners = pairs.select(col("ka").as("key"), col("kb").as("partner"))
      .unionAll(pairs.select(col("kb").as("key"), col("ka").as("partner")))
      .groupBy("key")
      .agg(count(lit(1)).as("n_fuzzy"), min("partner").as("min_partner"))
    names.join(partners, Seq("key"), "left")
      .select(col("key"), col("name"),
        coalesce(col("n_fuzzy"), lit(0L)).as("n_fuzzy"),
        col("min_partner"))
  }

  /** Q124: fuzzy-duplicate degree of part names at edit distance 1 —
    * FastSS blocking + exact verify (scaladoc above). Oracle is the
    * brute-force quadratic Levenshtein join, so the hash gate pins the
    * blocking's COMPLETENESS (a missed pair changes n_fuzzy), not just
    * its precision. */
  def q124FuzzyDegree(spark: SparkSession, sfDir: String): DataFrame =
    fuzzyDegreeOf(
      Tables.part(spark, sfDir)
        .select(col("p_partkey").as("key"), col("p_name").as("name")))
      .select(col("key").as("p_partkey"), col("name").as("p_name"),
        col("n_fuzzy"), col("min_partner"))
      .orderBy("p_partkey")

  /** Q143: q124 at edit distance 2 — the common record-linkage setting
    * (Bocek et al. §3's construction extended to the 2-deletion
    * neighborhood). The costs that jump with d, stated honestly: the
    * per-row fanout goes 1+n → 1+n+n(n−1)/2 variants (quadratic in name
    * length — still a DIMENSION-sized relation, never a fact table),
    * and the blocking admits more false positives for the Levenshtein
    * verify to clear (any two strings within 2 chars of length share
    * the hot short variants; the verify step owns exactness either
    * way). The oracle is the same brute-force quadratic join at d=2, so
    * the hash gate again pins blocking COMPLETENESS. */
  def q143FuzzyDegree2(spark: SparkSession, sfDir: String): DataFrame =
    fuzzyDegreeOf(
      Tables.part(spark, sfDir)
        .select(col("p_partkey").as("key"), col("p_name").as("name")),
      d = 2)
      .select(col("key").as("p_partkey"), col("name").as("p_name"),
        col("n_fuzzy"), col("min_partner"))
      .orderBy("p_partkey")
}
