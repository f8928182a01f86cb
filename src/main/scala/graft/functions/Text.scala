package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst
import org.apache.spark.sql.expressions.Window
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

  /** Catalyst-tree twins of [[tokens]] / [[normalized]] for SQL function
    * registration (GraftExtensions): a function-registry builder must
    * return a raw Catalyst expression — a Column-API tree comes back as a
    * lazy column-node wrapper the analyzer never resolves. Semantics
    * parity with the Column versions is pinned by VectorsSpec's SQL test.
    * Unresolved lambda variables and lenient types are fine here: builder
    * output goes through full analysis (lambda binding, type coercion). */
  private[graft] def lam(
      f: catalyst.expressions.NamedExpression => catalyst.expressions.Expression)
      : catalyst.expressions.LambdaFunction = {
    val v = catalyst.expressions.UnresolvedNamedLambdaVariable(Seq("t"))
    catalyst.expressions.LambdaFunction(f(v), Seq(v))
  }

  def tokensExpr(text: catalyst.expressions.Expression)
      : catalyst.expressions.Expression = Tokenize(text)

  /** The pre-round-9 higher-order-function formulation of [[tokens]],
    * kept as the DIFFERENTIAL REFERENCE for TokenizeParitySpec: same
    * semantics, interpreted evaluation (ArrayTransform/ArrayFilter are
    * CodegenFallback — the reason [[Tokenize]] exists). Never used in a
    * shipped plan. */
  private[graft] def tokensHofReference(text: catalyst.expressions.Expression)
      : catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    ArrayFilter(
      ArrayTransform(
        StringSplit(Lower(text), Literal("[^a-z0-9]+"), Literal(-1)),
        lam(t => Substring(t, Literal(1), Literal(MaxTokenLen)))),
      lam(t => GreaterThan(Length(t), Literal(0))))
  }

  def normalizedExpr(text: catalyst.expressions.Expression)
      : catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    StringTrim(RegExpReplace(Lower(text), Literal("[^a-z0-9]+"), Literal(" ")))
  }

  /** Array of normalized tokens for a text column — the native
    * [[Tokenize]] expression: one byte scan, participates in whole-stage
    * codegen. (The previous split/transform/filter formulation was
    * HOF-interpreted and broke every span it appeared in — see
    * [[Tokenize]]'s scaladoc and the CodegenAudit table.) */
  def tokens(text: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      Tokenize(org.apache.spark.sql.graftbridge.Bridge.expression(text)))

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

  /** Word n-gram shingles (n consecutive tokens joined by a space),
    * first-occurrence-ordered distinct — the native [[WordShingles]]
    * expression: one JVM loop, participates in whole-stage codegen.
    * (The previous transform/slice/array_join lambda was HOF-interpreted
    * — CodegenAudit's last class-3 survivor on the corpus scans; kept
    * below as the differential reference.) */
  def wordShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      WordShingles(org.apache.spark.sql.graftbridge.Bridge.expression(
        tokens(text)), n))

  /** The pre-round-10 higher-order-function formulation of
    * [[wordShingles]], kept as the DIFFERENTIAL REFERENCE for
    * WordShinglesParitySpec: same semantics, interpreted evaluation.
    * Never used in a shipped plan. */
  private[graft] def wordShinglesHofReference(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      transform(sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
        i => array_join(slice(toks, i, lit(n)), " ")))
  }

  /** Distinct word n-gram shingles as ROWS: (idCol, "s") — the scalable
    * formulation for dedup/similarity pipelines, and since round 10 a
    * PURE MAP-SIDE plan: tokenize once ([[Tokenize]], native), build the
    * per-document distinct shingle set in one loop ([[WordShingles]],
    * native), explode. No exchange, no sort, no window — the previous
    * `posexplode → lead(tok, k) over (partition by doc_id)` formulation
    * shuffled the whole token corpus on doc_id purely to realign tokens
    * that were adjacent in the source array (kept below as the
    * differential reference).
    *
    * Edge parity with the array formulation / DuckDB oracle: a document
    * shorter than n tokens yields its whole text as one shingle; a
    * document with no tokens yields the empty-string shingle.
    */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol),
      explode(wordShingles(col(textCol), n)).as("s"))

  /** The pre-round-10 window formulation of [[shingleRows]], kept as the
    * DIFFERENTIAL REFERENCE for WordShinglesParitySpec: same output set,
    * built via a doc_id exchange + window realignment. Never used in a
    * shipped plan. */
  private[graft] def shingleRowsWindowReference(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val byDoc = Window.partitionBy(idCol).orderBy("pos")
    // posexplode_OUTER keeps one (null pos, null token) row for a
    // token-less document, which the concat_ws below renders as the
    // empty-string shingle
    val toks = docs.select(col(idCol), posexplode_outer(tokens(col(textCol))))
    toks
      .select(col(idCol), col("pos"),
        concat_ws(" ", (0 until n).map(k =>
          if (k == 0) col("col") else lead(col("col"), k).over(byDoc)): _*)
          .as("s"),
        count(lit(1)).over(Window.partitionBy(idCol)).as("n_toks"))
      .where(col("pos").isNull ||
        col("pos") <= greatest(col("n_toks") - n, lit(0)))
      .select(col(idCol), col("s"))
      .distinct()
  }

}
