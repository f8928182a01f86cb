package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives re-expressing the reference's tokenizer semantics
  * (reference: src/main.c:37-58, SimpleInvertedIndex/inverted_index.c:118-135)
  * as codegen-friendly Spark built-ins — no UDFs on the hot path.
  *
  * Reference semantics preserved:
  *  - tokens are maximal alphanumeric runs (`isalnum`, main.c:39)
  *  - ASCII lowercase normalization (`tolower`, main.c:43) — we pin the token
  *    class to `[a-z0-9]` after `lower()`, documenting ASCII-only parity
  *    (SURVEY.md §7 "hard parts")
  *  - 255-char token cap, overflow bytes dropped (main.c:42-44)
  */
object Text {

  /** Maximum token length, matching MAX_WORD_LEN-1 (reference main.c:42-44). */
  val MaxTokenLen = 255

  /** Array of normalized tokens for a text column. Stays inside whole-stage
    * codegen: lower/split/filter/transform are all native expressions. */
  def tokens(text: Column): Column = {
    val raw = split(lower(text), "[^a-z0-9]+")
    filter(transform(raw, t => substring(t, 1, MaxTokenLen)), t => length(t) > 0)
  }

  /** One row per token (flatMap analog of the reference Map callback). */
  def explodedTokens(text: Column): Column = explode(tokens(text))

  /** Normalization used for exact dedup: lowercase and collapse every
    * non-alphanumeric run to a single space, trimmed. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Character n-gram shingles (n consecutive chars) of the normalized text.
    * Used by MinHash / n-gram Jaccard dedup. */
  def charShingles(text: Column, n: Int): Column = {
    val norm = normalized(text)
    // 1-based start positions; a string shorter than n yields itself.
    array_distinct(
      transform(sequence(lit(1), greatest(length(norm) - (n - 1), lit(1))),
        i => norm.substr(i, lit(n))))
  }

  /** Word n-gram shingles (n consecutive tokens joined by a space). */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      transform(sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
        i => array_join(slice(toks, i, lit(n)), " ")))
  }
}
