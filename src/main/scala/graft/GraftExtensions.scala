package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, Text}

/** Session extension registering graft's native Catalyst expressions with
  * the SQL function registry, so the SQL front-end can call them directly:
  *
  *   spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  *
  * Install via `SparkSession.builder.withExtensions(new GraftExtensions)`
  * or `--conf spark.sql.extensions=graft.GraftExtensions` (GraftSession
  * does the former). Besides the function registry this injects exactly ONE
  * planner strategy — [[graft.plans.GraftStrategy]], the physical
  * translation of the native as-of join ([[graft.plans.AsofJoinNode]]), the
  * single operator in this engine whose best composed shape still overpays
  * (the union+window twin shuffles both relations null-padded to the
  * combined width). Everything else stays declarative on purpose: the
  * plans are already optimal shapes, and a gratuitous rewrite rule would
  * just add planning cost (SURVEY.md §4).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** The one non-deprecated [[ExpressionInfo]] constructor is the full
    * 11-field form; every doc field beyond usage is legitimately empty
    * for these functions (no examples/notes/since), so centralize the
    * empty-string padding here. */
  private def info(className: String, name: String, usage: String) =
    new ExpressionInfo(className, null, name, usage,
      /* arguments = */ "", /* examples = */ "", /* note = */ "",
      /* group = */ "", /* since = */ "", /* deprecated = */ "",
      /* source = */ "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => new graft.plans.GraftStrategy)
    // SQL UPDATE / MERGE INTO over manifest tables: a post-hoc
    // resolution rule (Delta's pre-row-level-API shape) routes the
    // resolved statements onto updateWhere/mergeCoW — the same
    // file-pruned copy-on-write commits the Scala API runs
    // (graft.sources.GraftRowLevelSqlRule's scaladoc states why this
    // beats SupportsRowLevelOperations here).
    ext.injectPostHocResolutionRule(session =>
      new graft.sources.GraftRowLevelSqlRule(session))
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      info(classOf[DotProduct].getName, "vector_dot",
        "vector_dot(a, b) - dot product of two double arrays in index order"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info(classOf[CosineSimilarity].getName, "cosine_similarity",
        "cosine_similarity(a, b) - cosine similarity of two double arrays"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    // The text primitives compose built-in expressions, so SQL gets the
    // same tokenizer semantics as the Scala API. The builders return RAW
    // Catalyst trees (Text.tokensExpr etc.): a function-registry builder's
    // output must be analyzable, and a Column-API tree comes back as a
    // lazy column-node wrapper the analyzer never resolves. Parity with
    // the Column definitions is spec-pinned (VectorsSpec).
    ext.injectFunction((
      FunctionIdentifier("graft_tokens"),
      info(Text.getClass.getName, "graft_tokens",
        "graft_tokens(text) - reference-tokenizer token array: lowercase, " +
          "split on [^a-z0-9]+, drop empties, 255-char cap"),
      (children: Seq[Expression]) => Text.tokensExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      info(Text.getClass.getName, "graft_normalize",
        "graft_normalize(text) - dedup normalization: lowercase, collapse " +
          "non-alphanumeric runs to single spaces, trim"),
      (children: Seq[Expression]) => Text.normalizedExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_span_grams"),
      info(classOf[graft.functions.SpanGrams].getName, "graft_span_grams",
        "graft_span_grams(tokens, width) - per-position struct(w, g): the " +
          "token plus the md5-derived 60-bit key of the width-token gram " +
          "starting there (null for the last width-1 positions)"),
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable,
          "graft_span_grams(tokens, width): width must be a literal")
        val w = children(1).eval().asInstanceOf[Number].intValue
        // width < 1 would emit an (empty-gram-key, token) struct for
        // EVERY position — nonsense rows, silently; checkInputDataTypes
        // rejects it too, but the builder is where the SQL user's
        // literal is first in hand, so fail with the argument message
        require(w >= 1, s"graft_span_grams: width must be >= 1, got $w")
        graft.functions.SpanGrams(children.head, w)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_word_shingles"),
      info(classOf[graft.functions.WordShingles].getName, "graft_word_shingles",
        "graft_word_shingles(tokens, n) - distinct space-joined n-token " +
          "shingles in first-occurrence order; a shorter-than-n document " +
          "yields its whole token sequence, an empty one the empty string"),
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable,
          "graft_word_shingles(tokens, n): n must be a literal")
        val n = children(1).eval().asInstanceOf[Number].intValue
        require(n >= 1, s"graft_word_shingles: n must be >= 1, got $n")
        graft.functions.WordShingles(children.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      info(classOf[graft.functions.WinnowFingerprints].getName, "graft_winnow",
        "graft_winnow(text, gram, window) - winnowing fingerprints " +
          "(Schleimer et al.): distinct sliding-window minima of the " +
          "60-bit md5 keys of the text's gram-BYTE shingles (UTF-8 " +
          "byte windows; on non-ASCII input a gram may split a " +
          "multi-byte codepoint - feed ASCII/normalized text for " +
          "character-shingle semantics)"),
      (children: Seq[Expression]) => {
        require(children.length == 3 &&
          children(1).foldable && children(2).foldable,
          "graft_winnow(text, gram, window): gram and window must be literals")
        val g = children(1).eval().asInstanceOf[Number].intValue
        val w = children(2).eval().asInstanceOf[Number].intValue
        require(g >= 1 && w >= 1,
          s"graft_winnow: gram and window must be >= 1, got $g/$w")
        graft.functions.WinnowFingerprints(children.head, g, w)
      }))
    ext.injectFunction((
      FunctionIdentifier("common_prefix_len"),
      info(classOf[graft.functions.CommonPrefixLen].getName,
        "common_prefix_len",
        "common_prefix_len(a, b) - number of leading characters the two " +
          "strings share (byte scan, complete code points only)"),
      (children: Seq[Expression]) =>
        graft.functions.CommonPrefixLen(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("cut_spans"),
      info(classOf[graft.functions.CutSpans].getName, "cut_spans",
        "cut_spans(text, cuts) - text with every 1-based character " +
          "interval [span_start, span_end) in cuts removed; cuts is an " +
          "array<struct<span_start bigint, span_end bigint>> sorted " +
          "ascending and disjoint (one codegen byte walk)"),
      (children: Seq[Expression]) =>
        graft.functions.CutSpans(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_quality"),
      info(graft.operators.TextQueries.getClass.getName, "graft_quality",
        "graft_quality(text) - q24 quality score from length/alnum/" +
          "stopword signals"),
      (children: Seq[Expression]) =>
        graft.operators.TextQueries.qualityExpr(children.head)))
  }
}
