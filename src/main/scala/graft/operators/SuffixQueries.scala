package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.CommonPrefixLen

/** EXACT substring-level duplicate detection via distributed suffix
  * sorting — the suffix-array member of the dedup family. The gram-based
  * span family (q88/q89/q92) detects duplication at a fixed token
  * granularity; the suffix sort answers the exact character-level
  * question: for every document, how long is the longest substring that
  * also appears in ANOTHER document? That is the primitive of
  * exact-substring dedup (Lee et al., "Deduplicating Training Data Makes
  * Language Models Better", ACL '22, builds suffix arrays for exactly
  * this; reference README.md:41-51 has no such operator — extension
  * surface, like all of the dedup family).
  *
  * The core theorem that makes one sorted pass sufficient (standard
  * suffix-array property, proved by lexicographic betweenness): in ANY
  * lexicographic order of all suffixes, the longest common prefix
  * between a suffix of doc d and a suffix of any other doc is achieved
  * at an ADJACENT pair (s, r) with doc(s) = d, doc(r) ≠ d. Sketch: let
  * (p, q) realize the cross-doc maximum L for d. Every suffix between p
  * and q in sort order shares their first L characters (betweenness), so
  * walking from p toward q, the first suffix NOT from d is adjacent to a
  * suffix from d and the pair shares ≥ L characters; no adjacent
  * cross-doc pair can exceed the maximum, so max over adjacent pairs
  * EQUALS the true maximum, per doc. The theorem is collation-agnostic —
  * Spark's UTF8-binary sort and DuckDB's collation both qualify, which
  * is what lets the oracle replay the construction independently.
  *
  * Match lengths are CAPPED at [[PrefixCap]] characters: a match that
  * long is decision-grade duplication (q88's span machinery takes over
  * well below it), and the cap is what bounds the shuffle row width.
  *
  * Scale analysis (measured in tools.SuffixScaling, written up in
  * SCALING.md): at cap C the direct bounded sort ships one
  * min(C, remaining-doc-chars) prefix per corpus position through ONE
  * range exchange. The textbook alternative, prefix doubling over
  * integer ranks ([[suffixRanksByDoubling]], kept as the differential
  * twin and the unbounded-cap path), ships ~3 longs per position per
  * rank round — TWO sorted exchanges a round — for ceil(log2 C) rounds.
  * The naive byte math (C·n once vs 24·n·log2 C) suggests doubling wins
  * past C ≈ 200; the measurements say otherwise on this corpus: direct
  * wins EVERY cap tested (56 vs 654 MB shuffle and 5.8 vs 19.6 s at
  * C=128, sf0.1; still 62 vs 884 MB at C=512) because the shipped
  * prefix is bounded by the suffix's own length (~150 chars average
  * here) and template-heavy text compresses inside the shuffle, while
  * doubling pays log-many full-corpus sort rounds of incompressible
  * rank pairs. Doubling's regime is documents LONG relative to the cap
  * with poorly-compressing text — unbounded suffix arrays over
  * book-length unique documents, which is exactly where the literature
  * uses it. For a bounded dedup engine: know your cap, ship the bytes
  * once.
  */
object SuffixQueries {

  /** Match-length cap in characters — and therefore the prefix width
    * the sort ships per position. */
  val PrefixCap = 128

  /** Smallest cross-doc match worth reporting (below this, shared
    * substrings are stopword-phrase noise, not duplication signal). */
  val MinReport = 16

  /** One row per character position: (doc_id, pos 1-based, the
    * cap-bounded suffix prefix starting there). Shared with
    * [[SuffixRefresh]], whose delta rows must be EXACTLY the position
    * rows the stored index holds for those docs. */
  private[operators] def positions(docs: DataFrame, cap: Int): DataFrame = {
    // SCAN-PARALLELISM FLOOR before the ×|text| position explosion
    // (guide §2.5): the corpus parquet is a single row group, so the
    // explode — the operator's heaviest stage, one output row per
    // character with a cap-length prefix string — would otherwise run
    // at one task regardless of cores. Row-preserving round-robin;
    // inert at scale (the scan already yields ≥ cores splits) and
    // harmless to results: every consumer re-sorts (range partition +
    // sortWithinPartitions) or aggregates.
    val cores = docs.sparkSession.sparkContext.defaultParallelism
    val base = docs.select(col("doc_id"), col("text"))
      .where(length(col("text")) > 0)
    val wide = if (base.rdd.getNumPartitions < cores)
      base.repartition(cores) else base
    wide
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")))).as("pos"),
        col("text"))
      .select(col("doc_id"), col("pos"),
        col("text").substr(col("pos"), lit(cap)).as("pref"))
  }

  /** Global sort order + contiguous dense index, without a
    * single-partition window: range-repartition by the sort key, sort
    * within partitions, then RDD zipWithIndex (per-partition offsets
    * from one count pass — the q72 dense-indexing shape). */
  private def sortedWithIndex(sfx: DataFrame): DataFrame = {
    val spark = sfx.sparkSession
    val sorted = sfx
      .repartitionByRange(col("pref"), col("doc_id"), col("pos"))
      .sortWithinPartitions("pref", "doc_id", "pos")
      .localCheckpoint()
    val schema = sorted.schema.add("idx", LongType, nullable = false)
    spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }

  /** The direct construction's sort stage alone — the seam
    * [[graft.tools.SuffixScaling]] measures against the doubling twin
    * (same output granularity: one globally ordered indexed position
    * table), so the A/B compares the two CONSTRUCTIONS, not the shared
    * LCP/aggregate tail. */
  private[graft] def directSuffixIndex(docs: DataFrame, cap: Int): DataFrame =
    sortedWithIndex(positions(docs, cap))

  /** The q114 engine over any (doc_id, text) relation: bounded suffix
    * sort → adjacent cross-doc LCP → per-doc max.
    *
    * The adjacent scan is the canonical distributed shape for
    * consecutive-pair work over a global sort: pairs WITHIN a partition
    * stream through one fused per-partition pass (no index, no
    * self-join), and the numPartitions-1 CROSS-partition pairs come from
    * a driver handoff of each partition's first row — O(partitions)
    * rows collected, nothing corpus-sized. The first cut self-joined an
    * indexed copy on idx = idx+1: two extra corpus-sized hash exchanges
    * to recover pairs the sorted partitions already held contiguously —
    * measured at sf0.1, the scan shape is 253 → 51 MB shuffle and
    * 8.1 → 6.1 s; checkpointing the exploded positions so the range
    * sampler does not re-run the explode takes it to 4.2 s. LCP per
    * pair calls
    * the same code-point scan the [[graft.functions.CommonPrefixLen]]
    * expression generates ([[CommonPrefixLen.prefixChars]]), so the
    * SQL-facing expression and the fused scan cannot drift. */
  private[graft] def suffixRepeatsOf(docs: DataFrame, cap: Int,
      minReport: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pos = positions(docs, cap)
      .select(col("doc_id"), col("pref"))
      .localCheckpoint() // the range sampler below reads rows, not lineage
    val sorted = pos
      .repartitionByRange(col("pref"), col("doc_id"))
      .sortWithinPartitions("pref", "doc_id")
      .localCheckpoint() // one materialization feeds both passes below
    val firsts = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        it.take(1).map(r => (pid, r.getLong(0), r.getString(1)))
      }.collect().sortBy(_._1)
    val bcFirsts = spark.sparkContext.broadcast(firsts)
    val adj = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      // sliding pairs within the partition, then the boundary pair
      // against the NEXT non-empty partition's first row
      var prevDoc = 0L
      var prevPref: String = null
      val inner = it.flatMap { r =>
        val d = r.getLong(0)
        val p = r.getString(1)
        val out =
          if (prevPref != null && prevDoc != d)
            Iterator((prevDoc, d,
              CommonPrefixLen.prefixChars(prevPref, p)))
          else Iterator.empty
        prevDoc = d
        prevPref = p
        out
      }
      def boundary =
        bcFirsts.value.find(_._1 > pid) match {
          case Some((_, d, p)) if prevPref != null && prevDoc != d =>
            Iterator((prevDoc, d, CommonPrefixLen.prefixChars(prevPref, p)))
          case _ => Iterator.empty
        }
      inner ++ boundary
    }.toDF("doc_id", "doc_id2", "l")
    adj.select(col("doc_id"), col("l"))
      .unionAll(adj.select(col("doc_id2").as("doc_id"), col("l")))
      .groupBy("doc_id")
      .agg(max(col("l")).cast(LongType).as("max_shared"))
      .where(col("max_shared") >= minReport)
      .orderBy("doc_id")
  }

  /** The per-doc longest-cross-doc-match table as an ARTIFACT — the
    * house discipline for corpus-scan products (shingles, signatures,
    * docFeatures): the suffix sort runs ONCE per (session, scale dir),
    * is written bucketed on doc_id, and every consumer (q114's report,
    * q115's per-source profile) reads the table. Unfiltered
    * (minReport = 1) so consumers pick their own thresholds. */
  def suffixShared(spark: SparkSession, sfDir: String): DataFrame =
    graft.Artifacts.materialize(spark,
        "graft_suffixshared_" + Tables.dirKey(spark, sfDir), "doc_id") {
      suffixRepeatsOf(Tables.documents(spark, sfDir), PrefixCap, 1)
    }

  /** Q114: longest cross-document substring per document (capped at
    * [[PrefixCap]] chars), docs at or above [[MinReport]] only. */
  def q114SuffixRepeats(spark: SparkSession, sfDir: String): DataFrame =
    suffixShared(spark, sfDir)
      .where(col("max_shared") >= MinReport)
      .orderBy("doc_id")

  /** Q115: duplication profile by SOURCE — the reporting layer over the
    * suffix artifact: per source, how many docs carry a decision-grade
    * (>= [[DupThreshold]] chars) cross-document match, plus the summed
    * match lengths. The join side is the docs-sized artifact, never the
    * position table; with the artifact in place this is a broadcast
    * join + one tiny aggregate. */
  def q115SourceDupProfile(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
      .join(suffixShared(spark, sfDir), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("max_shared") >= DupThreshold, 1L).otherwise(0L))
          .as("dup_docs"),
        sum(coalesce(col("max_shared"), lit(0L))).as("sum_shared"))
      .orderBy("source")

  /** A cross-doc match this long is duplication, not phrase reuse. */
  val DupThreshold = 32

  // ---------------------------------------------------------------------
  // Per-POSITION match lengths (q118) — the Lee et al. coverage signal
  // ---------------------------------------------------------------------

  /** One row per corpus position: the length of the longest substring
    * starting THERE that also appears in another document (capped),
    * rows at or above `minLen` only.
    *
    * Soundness: in suffix order, lcp(i, j) = min of the adjacent lcps
    * between them, so lcp to another doc's suffix is maximized by the
    * NEAREST other-doc row above/below — and because same-doc rows form
    * maximal runs only interrupted by other docs, "nearest other-doc
    * above" is found by the classic two-candidate scan: carry (the last
    * row, the last row whose doc differs from it); for the current row,
    * the nearest other-doc predecessor is the first of those two whose
    * doc differs. LCP against it is ONE direct [[CommonPrefixLen]] call
    * on the capped prefixes (no min-chain: prefixes are materialized).
    *
    * Distribution: partitions are range-sorted; the summary pass and
    * the forward scan STREAM (O(1) state — two candidate rows), and
    * only the backward scan holds its partition resident (it must
    * visit rows in reverse of the sort order). The scan state entering
    * every partition is rebuilt on the DRIVER from per-partition
    * summaries (4 rows each: first/last row and the nearest
    * differing-doc row from each end) folded in partition order and
    * broadcast — the prefix-sum shape: O(partitions) driver rows,
    * nothing corpus-sized, one extra pass over the checkpointed sort.
    *
    * MEMORY CONTRACT: the one buffered pass bounds per-task heap by
    * partition size (~2 bytes per buffered prefix char + ~64 bytes of
    * row/tuple overhead per position — heap residency, NOT spillable
    * sorter memory). The range exchange is therefore sized explicitly:
    * partition count = max(spark.sql.shuffle.partitions,
    * ceil(estimated heap bytes / `targetPartitionHeap`)), with the
    * estimate computed from one aggregate over the documents (exact
    * per-doc prefix-char arithmetic, no sampling). An oversized corpus
    * SPLITS into more partitions instead of OOMing the task — pinned by
    * the adversarial small-target case in SuffixSpec. */
  private[graft] def positionMatchLengths(docs: DataFrame, cap: Int,
      minLen: Int,
      targetPartitionHeap: Long = 256L * 1024 * 1024): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pos = positions(docs, cap)
      .select(col("doc_id"), col("pos"), col("pref"))
      .localCheckpoint()
    // explicit partition sizing off exact per-doc arithmetic: a doc of
    // length n contributes n positions; its summed prefix chars are
    // n(n+1)/2 when n <= cap, else (n-cap)·cap + cap(cap+1)/2
    val est = docs.select(length(col("text")).cast(LongType).as("n"))
      .where(col("n") > 0)
      .select(
        sum(col("n")).as("positions"),
        sum(when(col("n") <= cap, expr("n * (n + 1) div 2"))
          .otherwise((col("n") - cap) * cap + lit(cap.toLong * (cap + 1) / 2)))
          .as("pref_chars"))
      .head()
    val heapBytes =
      (if (est.isNullAt(0)) 0L else est.getLong(0)) * 64L +
        (if (est.isNullAt(1)) 0L else est.getLong(1)) * 2L
    val numParts = math.max(
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      ((heapBytes + targetPartitionHeap - 1) / targetPartitionHeap).toInt)
    val sorted = pos
      .repartitionByRange(numParts, col("pref"), col("doc_id"), col("pos"))
      .sortWithinPartitions("pref", "doc_id", "pos")
      .localCheckpoint()

    type Ent = (Long, String) // (doc_id, pref)
    // per-partition summary: (pid, first, firstDiff, last, lastDiff) —
    // STREAMED with O(1) state: firstDiff is the first row whose doc
    // differs from the first row's; lastDiff is the last row whose doc
    // differs from the LAST row's, i.e. the closing row of the
    // second-to-last doc run, carried as `prev` at each run boundary
    val summaries = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var first: Ent = null
      var firstDiff: Option[Ent] = None
      var prev: Ent = null
      var lastRunPrev: Ent = null // last row of the run before prev's run
      while (it.hasNext) {
        val r = it.next()
        val e = (r.getLong(0), r.getString(2))
        if (first == null) first = e
        else {
          if (firstDiff.isEmpty && e._1 != first._1) firstDiff = Some(e)
          if (prev._1 != e._1) lastRunPrev = prev
        }
        prev = e
      }
      if (first == null) Iterator.empty
      else Iterator((pid, first, firstDiff, prev, Option(lastRunPrev)))
    }.collect().sortBy(_._1)

    // two-candidate state: (last row seen, last row with doc != last's)
    type St = (Option[Ent], Option[Ent])
    def advance(st: St, newLast: Ent, diffWithin: Option[Ent]): St = {
      val other = diffWithin.orElse(st._1 match {
        case Some(l) if l._1 != newLast._1 => Some(l)
        case _ => st._2
      })
      (Some(newLast), other)
    }
    // state entering each partition from the LEFT (fold in pid order)
    // and from the RIGHT (fold in reverse) — driver-side, 32 entries
    val fromLeft = scala.collection.mutable.Map.empty[Int, St]
    var st: St = (None, None)
    for (s <- summaries) {
      fromLeft(s._1) = st
      st = advance(st, s._4, s._5)
    }
    val fromRight = scala.collection.mutable.Map.empty[Int, St]
    st = (None, None)
    for (s <- summaries.reverseIterator) {
      fromRight(s._1) = st
      st = advance(st, s._2, s._3)
    }
    val bcL = spark.sparkContext.broadcast(fromLeft.toMap)
    val bcR = spark.sparkContext.broadcast(fromRight.toMap)

    sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      // nearest differing-doc candidate under the two-candidate state
      def candOf(state: St, d: Long): Option[Ent] = state._1 match {
        case Some(l) if l._1 != d => Some(l)
        case Some(_) => state._2
        case None => None
      }
      def advanceRow(state: St, d: Long, p: String): St = state._1 match {
        case Some(l) if l._1 != d => (Some((d, p)), Some(l))
        case _ => (Some((d, p)), state._2)
      }
      // FORWARD scan streams: each row is scored as it arrives off the
      // sorter, then appended to the one resident buffer (flat primitive
      // columns + the prefix strings) that the backward scan — which
      // must visit rows in reverse sort order — replays
      val dIds = Array.newBuilder[Long]
      val poss = Array.newBuilder[Int]
      val prefs = Array.newBuilder[String]
      val bestB = Array.newBuilder[Int]
      var state: St = bcL.value.getOrElse(pid, (None, None))
      while (it.hasNext) {
        val r = it.next()
        val d = r.getLong(0)
        val p = r.getString(2)
        var b = 0
        candOf(state, d).foreach { c =>
          val l = CommonPrefixLen.prefixChars(p, c._2)
          if (l > b) b = l
        }
        dIds += d; poss += r.getInt(1); prefs += p; bestB += b
        state = advanceRow(state, d, p)
      }
      val ids = dIds.result()
      val ps = poss.result()
      val pf = prefs.result()
      val best = bestB.result()
      val n = ids.length
      state = bcR.value.getOrElse(pid, (None, None))
      var i = n - 1
      while (i >= 0) {
        val d = ids(i)
        val p = pf(i)
        candOf(state, d).foreach { c =>
          val l = CommonPrefixLen.prefixChars(p, c._2)
          if (l > best(i)) best(i) = l
        }
        state = advanceRow(state, d, p)
        i -= 1
      }
      Iterator.range(0, n).filter(best(_) >= minLen).map { i =>
        (ids(i), ps(i), best(i))
      }
    }.toDF("doc_id", "pos", "l")
  }

  /** The dup-position table (doc_id, pos, l >= [[DupThreshold]]) as an
    * ARTIFACT, bucketed on doc_id: the position scan runs once per
    * (session, scale dir) and both consumers (q118's histogram, q119's
    * trim plan) read the bucketed rows — their doc-keyed windows then
    * run off the bucketed scan. */
  def suffixPositions(spark: SparkSession, sfDir: String): DataFrame =
    graft.Artifacts.materialize(spark,
        "graft_suffixpos_" + Tables.dirKey(spark, sfDir), "doc_id") {
      positionMatchLengths(Tables.documents(spark, sfDir),
        PrefixCap, DupThreshold)
    }

  /** Q119: the TRIM PLAN — q118's signal turned into the actionable
    * artifact a dedup pipeline actually writes: per doc, the MERGED
    * character intervals to cut (1-based [span_start, span_end), every
    * position inside a >= [[DupThreshold]]-char cross-doc match).
    * Islands via the same running-max window that q118 sums: a new
    * island starts where a position clears the running max end; the
    * island id is the running count of such breaks; one group-by emits
    * (start, end) per island. Same single doc-keyed exchange of dup
    * positions; q118 is the histogram of this plan (spec pins
    * sum(span lengths) == q118's dup_chars doc-for-doc). */
  def q119TrimPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val hits = suffixPositions(spark, sfDir)
      .select(col("doc_id"), col("pos"), (col("pos") + col("l")).as("e"))
    val prev = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    hits
      .withColumn("brk",
        when(col("pos") > coalesce(max(col("e")).over(prev), lit(0L)), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(run))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).cast(LongType).as("span_start"),
        max(col("e")).cast(LongType).as("span_end"))
      .select("doc_id", "span_start", "span_end")
      .orderBy("doc_id", "span_start")
  }

  /** Q121: the trim plan APPLIED — the exact-substring TRIMMED CORPUS,
    * which is the pipeline's actual deliverable (Lee et al. ACL '22
    * remove the duplicated span and keep the fresh remainder; q119's
    * merged intervals are the plan, this is the execution — precisely
    * the q92 relationship for the gram family). Every character inside
    * a q119 span is cut; the output is per-doc bookkeeping
    * (n_chars / kept_chars / removed_chars) plus the md5 of the
    * surviving text, so the oracle hash-checks the exact reconstruction
    * without shipping the trimmed corpus through the compare.
    *
    * Scale shape: the spans relation is doc-keyed and SPARSE (only
    * docs with decision-grade duplication emit spans — 53 rows at
    * sf0.01 against 500 docs), so the per-doc span arrays are a
    * docs-sized side that joins the documents scan on doc_id; the
    * reconstruction is one pass over each doc's text with its sorted
    * span array — the native [[graft.functions.CutSpans]] byte walk,
    * inside whole-stage codegen on the documents scan (the interpreted
    * `aggregate` fold it replaced is kept as [[survivingFold]], the
    * differential twin) — no position explosion, no
    * corpus-sized exchange beyond the doc-keyed join. Span arrays are
    * bounded by n_chars / DupThreshold per doc, the merged-interval
    * bound. Spec pins removed_chars == q118's dup_chars doc-for-doc
    * (the spans ARE the coverage), and the md5 against a JVM replay. */
  /** Surviving text via the native codegen byte walk
    * ([[graft.functions.CutSpans]]); span-free docs (null `cuts` from
    * the left join) pass through untouched. */
  private[graft] def survivingNative(text: Column, cuts: Column): Column =
    when(cuts.isNull, text)
      .otherwise(graft.functions.CutSpans.of(text, cuts))

  /** The interpreted `aggregate`-fold twin CutSpans replaced — kept as
    * the differential oracle (CutSpansParitySpec pins equality on the
    * live q119 relation and constructed edge/unicode cases): state =
    * (next uncut position, accumulated surviving text); each span
    * appends the gap before it, the finisher the tail after the last
    * span. CodegenFallback — never on the shipped q121 path. */
  private[graft] def survivingFold(text: Column, cuts: Column): Column =
    when(cuts.isNull, text).otherwise(
      aggregate(
        cuts,
        struct(lit(1L).as("p"), lit("").as("acc")),
        (st, c) => struct(
          c.getField("span_end").as("p"),
          concat(st.getField("acc"),
            text.substr(st.getField("p").cast("int"),
              (c.getField("span_start") - st.getField("p")).cast("int")))
            .as("acc")),
        st => concat(st.getField("acc"),
          text.substr(st.getField("p").cast("int"),
            (length(text) + 1 - st.getField("p")).cast("int")))))

  def q121SuffixTrimmed(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val cuts = q119TrimPlan(spark, sfDir)
      .groupBy("doc_id")
      .agg(array_sort(collect_list(
        struct(col("span_start"), col("span_end")))).as("cuts"))
    val joined = docs.select(col("doc_id"), col("text"))
      .join(cuts, Seq("doc_id"), "left")
    joined
      .withColumn("surv", survivingNative(col("text"), col("cuts")))
      .select(col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars"),
        length(col("surv")).cast(LongType).as("kept_chars"),
        (length(col("text")) - length(col("surv"))).cast(LongType)
          .as("removed_chars"),
        md5(col("surv")).as("trimmed_md5"))
      .orderBy("doc_id")
  }

  /** Q118: per-doc DUPLICATE-CHARACTER COVERAGE — the position-level
    * decision signal of exact-substring dedup (Lee et al.: drop or trim
    * spans, not whole docs): for every document, how many of its
    * characters sit inside a cross-document match of at least
    * [[DupThreshold]] chars. Positions carry intervals [pos, pos+l);
    * the per-doc union length is the classic running-max window (one
    * doc-keyed exchange of the DUP POSITIONS ONLY — sub-corpus-sized).
    * The cap cannot under-count coverage: inside a longer true span
    * every position within cap of the span end still reaches it. */
  def q118DupCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val hits = suffixPositions(spark, sfDir)
      .select(col("doc_id"), col("pos"), (col("pos") + col("l")).as("e"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val per = hits
      .withColumn("pmax", max(col("e")).over(w))
      .select(col("doc_id"),
        greatest(lit(0L),
          col("e") - greatest(coalesce(col("pmax"), lit(0L)),
            col("pos").cast(LongType))).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("dup_chars"))
    docs.select(col("doc_id"), length(col("text")).cast(LongType).as("n_chars"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"))
      .orderBy("doc_id")
  }

  /** Snapshot B's per-doc suffix table — a FULL recompute over the q79
    * recrawl derivation, materialized once.
    *
    * Why this is NOT the q98 stale-drop/fresh-compute refresh: doc
    * features are per-doc pure functions, so dropping stale rows and
    * computing fresh ones is exact. `max_shared` is a GLOBAL property —
    * removing a document can LOWER the max of an untouched document
    * whose best match it was (spec-proven in SuffixSpec with exactly
    * that construction), so any delta-local refresh is unsound. The
    * r10 guidance applies in its pure form: recompute freely, write
    * incrementally — the sound refresh recomputes the table on B, and
    * the incremental value lives entirely in the WRITE side, which is
    * what [[q116SuffixDelta]] materializes (the changed rows ARE the
    * write set, measured in tools.SuffixScaling). */
  def suffixSharedB(spark: SparkSession, sfDir: String): DataFrame =
    graft.Artifacts.materialize(spark,
        "graft_suffixshared_b_" + Tables.dirKey(spark, sfDir), "doc_id") {
      suffixRepeatsOf(
        CurationPipeline.snapshotB(Tables.documents(spark, sfDir)),
        PrefixCap, 1)
    }

  /** Q116: the suffix-table CHANGE REPORT between snapshots — per doc
    * whose longest cross-doc match changed: (doc_id, prev, new). This
    * is the incremental WRITE SET of the refresh (apply it to the A
    * table and you hold the B table), and it surfaces the global
    * effect directly: the report legitimately contains documents the
    * recrawl never touched, because a removed duplicate partner lowers
    * the survivor's match. Both inputs are docs-sized artifacts; the
    * diff is one full-outer join on doc_id, delta-sized output. */
  def q116SuffixDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val a = suffixShared(spark, sfDir)
      .withColumnRenamed("max_shared", "prev_shared")
    val b = suffixSharedB(spark, sfDir)
      .withColumnRenamed("max_shared", "new_shared")
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("prev_shared"), lit(0L)).as("prev_shared"),
        coalesce(col("new_shared"), lit(0L)).as("new_shared"))
      .where(col("prev_shared") =!= col("new_shared"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // Prefix-doubling twin (the unbounded-cap construction)
  // ---------------------------------------------------------------------

  /** Order-isomorphic rank per key tuple without a global window: sort by
    * the keys, dense-index, take min(index) per distinct key — ranks are
    * not dense but preserve exactly the key order, which is all prefix
    * doubling needs. Two exchanges per call (range sort + key agg). */
  private def rankOf(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val indexed = sortedWithIndexBy(df, keyCols)
    val ranks = indexed.groupBy(keyCols.map(col): _*)
      .agg(min(col("idx")).as("rank"))
    indexed.join(ranks, keyCols)
      .select(col("doc_id"), col("pos"), col("rank"))
  }

  private def sortedWithIndexBy(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.head, keyCols.tail: _*)
      .localCheckpoint()
    val schema = sorted.schema.add("idx", LongType, nullable = false)
    spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }

  /** Suffix ranks by PREFIX DOUBLING (Manber–Myers on a cluster): round k
    * ranks each position by (rank of its 2^k-prefix, rank of the next
    * 2^k-prefix), so after ceil(log2 cap) rounds ranks order suffixes by
    * their first `cap` characters — every round exchanges fixed-width
    * integer rows, never strings. Rows past a document's end pair with
    * rank -1 (shorter suffix sorts first, matching string order).
    * Returns (doc_id, pos, rank) with rank order-isomorphic to the
    * bounded-prefix lexicographic order (differentially spec-pinned
    * against the direct sort in SuffixSpec). Early-exits when all ranks
    * are distinct — further rounds cannot change a total order.
    *
    * `cap` must be a power of two (asserted): the doubling rounds rank
    * by exactly 2^k characters, so a non-power-of-two cap would end the
    * loop ranking by the next power of two ABOVE it — a strict
    * refinement of the cap-bounded order that separates suffixes tying
    * on the first `cap` chars, violating the order-isomorphism contract
    * (rank tie ⟺ capped-prefix tie) the direct-sort differential spec
    * pins. Every engine cap ([[PrefixCap]]) is a power of two. */
  private[graft] def suffixRanksByDoubling(docs: DataFrame, cap: Int): DataFrame = {
    require(cap > 0 && Integer.bitCount(cap) == 1,
      s"doubling cap must be a power of two, got $cap — a 2^k round " +
        "structure cannot stop ranking at a non-power-of-two prefix length")
    val base = positions(docs, 1)
      .withColumnRenamed("pref", "c0")
    var cur = rankOf(base, Seq("c0")).localCheckpoint()
    var k = 1
    while (k < cap) {
      val n = cur.count()
      if (cur.select(countDistinct(col("rank"))).head.getLong(0) == n) {
        k = cap // total order reached: every later round is the identity
      } else {
        val nxt = cur.select(col("doc_id"), (col("pos") - k).as("pos"),
          col("rank").as("r2"))
        val paired = cur.withColumnRenamed("rank", "r1")
          .join(nxt, Seq("doc_id", "pos"), "left")
          .select(col("doc_id"), col("pos"), col("r1"),
            coalesce(col("r2"), lit(-1L)).as("r2"))
        cur = rankOf(paired, Seq("r1", "r2")).localCheckpoint()
        k *= 2
      }
    }
    cur
  }
}
