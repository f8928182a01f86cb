package graft.sources

import scala.annotation.tailrec

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{coalesce, col, count, countDistinct, lit, monotonically_increasing_id, when}
import org.apache.spark.sql.graftbridge.Bridge

/** SQL `UPDATE` and `MERGE INTO` over manifest tables — the two
  * row-level statements [[GraftCatalog]]'s DSv2 surface alone cannot
  * serve, routed onto the SAME file-pruned copy-on-write machinery the
  * Scala API uses ([[ManifestTable.updateWhere]] /
  * [[ManifestTable.mergeCoW]]) by one post-hoc resolution rule — the
  * shape Delta shipped for years before Spark's row-level-operations
  * API existed (DeltaAnalysis rewriting `UpdateTable`/`MergeIntoTable`
  * into runnable commands).
  *
  * Why a rule and not `SupportsRowLevelOperations`: Spark's
  * group-based row-level API physically re-plans the statement as
  * `ReplaceData` — a full DSv2 batch WRITE whose executor-side
  * `DataWriter` must serialize `InternalRow`s to parquet through
  * Spark's internal write support, plus a `_file`-emitting DSv2 scan
  * with runtime group filtering to bound the rewrite. All of that
  * machinery already exists here, better: `updateWhere`/`mergeCoW`
  * find affected files from the manifest (bounds stabbing — no
  * runtime-filter subquery), rewrite them through the ordinary
  * DataFrame writer, and commit atomically with constraints, delete
  * sequencing, and the resurrection guard enforced. The rule reaches
  * that path at analysis time; the row-level API would reach a
  * re-implementation of it. (The V1 read bridge this leaves in place
  * is measured at pruning parity with the Scala scan — SCALING.md's
  * catalog sections.)
  *
  * Honest limits (each rejected LOUDLY at analysis, never served
  * wrong): subqueries in conditions/assignments; `MERGE` conditions
  * that are not a conjunction of `target.col = source.col` equalities
  * (single- OR multi-column — the manifest merge is tuple-keyed; any
  * non-equi conjunct rejects); `UPDATE SET` / `MERGE UPDATE SET`
  * re-keying a merge key column; nested (struct-field) assignment
  * targets; time-travel-pinned targets. */
class GraftRowLevelSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u: UpdateTable if u.resolved =>
      graftRoot(u.table).map { root =>
        // static contract checks HERE, at analysis — a bad statement
        // must fail before anything executes
        import GraftRowLevelSql._
        u.condition.foreach(checkNoSubquery(_, "UPDATE WHERE"))
        u.assignments.foreach { a =>
          targetName(a, "UPDATE")
          checkNoSubquery(a.value, "UPDATE SET")
        }
        GraftUpdateCommand(root, u.assignments, u.condition)
          : LogicalPlan
      }.getOrElse(u)
    case m: MergeIntoTable if m.resolved =>
      graftRoot(m.targetTable).map { root =>
        import GraftRowLevelSql._
        val keyPairs = mergeKeysOf(m.targetTable,
          m.sourceTable, m.mergeCondition)
        (m.matchedActions ++ m.notMatchedActions ++
          m.notMatchedBySourceActions).foreach { a =>
          a.condition.foreach(checkNoSubquery(_, "WHEN ... AND"))
          a match {
            case u: UpdateAction => u.assignments.foreach { asg =>
              checkNoSubquery(asg.value, "WHEN MATCHED UPDATE")
              val kAttr = asg.key match {
                case ar: AttributeReference => ar
                case other => throw new UnsupportedOperationException(
                  "WHEN MATCHED UPDATE: only top-level column " +
                    s"assignments are supported, got ${other.sql}")
              }
              // assigning a merge-key column: identity ONLY when the
              // value IS that pair's own join-key attribute (by exprId
              // — a same-NAMED but different source column, or the
              // OTHER key column of the tuple, would silently re-key
              // matched rows, exactly the hazard this guard exists
              // for)
              keyPairs.find(_._1.exprId == kAttr.exprId).foreach {
                case (tKeyAttr, sKeyAttr) =>
                  stripCasts(asg.value) match {
                    case ar: AttributeReference
                        if ar.exprId == sKeyAttr.exprId ||
                          ar.exprId == tKeyAttr.exprId => // identity
                    case _ =>
                      throw new UnsupportedOperationException(
                        "MERGE UPDATE: assigning the merge key column " +
                          s"${tKeyAttr.name} would re-key matched rows " +
                          "— the keyed rewrite replaces rows BY key; " +
                          "re-key with DELETE + INSERT")
                  }
              }
            }
            case ins: InsertAction => ins.assignments.foreach { asg =>
              targetName(asg, "WHEN NOT MATCHED INSERT")
              checkNoSubquery(asg.value, "WHEN NOT MATCHED INSERT")
            }
            case _ =>
          }
        }
        GraftMergeCommand(root, m.targetTable, m.sourceTable,
          m.mergeCondition, m.matchedActions, m.notMatchedActions,
          m.notMatchedBySourceActions)
          : LogicalPlan
      }.getOrElse(m)
    case _ => plan
  }

  /** The manifest-table root when `plan` is a (possibly aliased)
    * [[GraftSqlTable]] relation; None leaves the statement to Spark
    * (other catalogs' tables must keep their own behavior). A
    * time-travel pin rejects loudly — writes go to the bare table. */
  private def graftRoot(plan: LogicalPlan): Option[String] = {
    @tailrec def unwrap(p: LogicalPlan): Option[DataSourceV2Relation] =
      p match {
        case SubqueryAlias(_, child) => unwrap(child)
        case r: DataSourceV2Relation => Some(r)
        case _ => None
      }
    unwrap(plan).map(_.table).collect {
      case t: GraftSqlTable =>
        require(t.pinnedVersion.isEmpty,
          s"cannot write to ${t.name()} — it is pinned by time " +
            "travel; write to the bare table identifier")
        t.tableRoot
    }
  }
}

private[sources] object GraftRowLevelSql {

  /** Subqueries reference OTHER plans — no keyed/pruned rewrite can
    * evaluate them; rejected at analysis with a routing hint. */
  def checkNoSubquery(e: Expression, what: String): Unit = e.foreach {
    case s: SubqueryExpression =>
      throw new UnsupportedOperationException(
        s"$what: subqueries are not supported in row-level SQL " +
          s"over graft tables (got ${s.getClass.getSimpleName}); " +
          "materialize the subquery as a view and join it in a " +
          "MERGE instead")
    case _ =>
  }

  /** A resolved expression re-expressed as a Column that resolves
    * against ANY frame carrying the same column names — the bridge
    * from the analyzed statement's attribute IDs to the fresh reads
    * `updateWhere` plans internally. Sound exactly because an UPDATE
    * references one table: every attribute is one of its columns, so
    * name-resolution cannot capture a foreign column. */
  def unresolved(e: Expression, what: String): Column = {
    checkNoSubquery(e, what)
    Bridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  /** Assignment target column name; nested targets rejected. */
  def targetName(a: Assignment, what: String): String = a.key match {
    case ar: AttributeReference => ar.name
    case other => throw new UnsupportedOperationException(
      s"$what: only top-level column assignments are supported, got " +
        other.sql)
  }

  /** The (target key, source key) of a MERGE condition — the manifest
    * merge is KEYED, so only a single-column equality qualifies.
    * Analyzer-inserted casts (the key columns differing in width, e.g.
    * BIGINT target vs INT source) are stripped before classifying: a
    * cast-wrapped keyed equality is still keyed, not "non-equi". */
  /** Analyzer-inserted widening casts peeled off an expression. */
  def stripCasts(e: Expression): Expression = e match {
    case c: org.apache.spark.sql.catalyst.expressions.Cast =>
      stripCasts(c.child)
    case x => x
  }

  /** The (target key, source key) PAIRS of a MERGE condition — the
    * manifest merge is keyed on a column TUPLE, so the condition must
    * be a conjunction of `target.col = source.col` equalities (one or
    * more; either side order). A mixed AND (any non-equi conjunct, a
    * subquery, a same-side equality) rejects loudly — the keyed
    * rewrite has no residual-predicate slot, and silently dropping a
    * conjunct would merge the wrong rows. Duplicate target columns
    * reject too (two conjuncts keying the same column have no tuple
    * meaning). Pair order follows the statement's conjunct order —
    * [[ManifestTable.mergeCoWKeys]] prunes files on the FIRST key's
    * stored bounds, so lead with the clustered column. */
  def mergeKeysOf(target: LogicalPlan, source: LogicalPlan,
                  cond: Expression)
      : Seq[(AttributeReference, AttributeReference)] = {
    checkNoSubquery(cond, "MERGE ON")
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def fail(got: Expression): Nothing =
      throw new UnsupportedOperationException(
        "MERGE INTO a graft table needs ON to be a conjunction of " +
          s"target.col = source.col equalities; got ${got.sql}. The " +
          "manifest merge is keyed — non-equi conjuncts have no keyed " +
          "rewrite")
    val pairs = conjuncts(cond).map {
      case EqualTo(l0, r0) => (stripCasts(l0), stripCasts(r0)) match {
        case (l: AttributeReference, r: AttributeReference)
            if target.outputSet.contains(l) &&
              source.outputSet.contains(r) => (l, r)
        case (l: AttributeReference, r: AttributeReference)
            if target.outputSet.contains(r) &&
              source.outputSet.contains(l) => (r, l)
        case _ => fail(cond)
      }
      case other => fail(other)
    }
    require(pairs.map(_._1.exprId).distinct.size == pairs.size,
      "MERGE INTO a graft table: the ON conjunction keys target " +
        s"column(s) ${pairs.map(_._1.name).mkString(", ")} more than " +
        "once — each target column may appear in exactly one equality")
    pairs
  }
}

/** `UPDATE t SET ... WHERE ...` → [[ManifestTable.updateWhere]]: the
  * file-pruned copy-on-write rewrite behind one commit — constraints
  * validated on updated values, original-row SET semantics, the
  * delete-key resurrection guard, all inherited from the one
  * implementation. Identity assignments (the aligned form Spark
  * produces lists every column) are dropped — only real SETs reach
  * the rewrite. */
case class GraftUpdateCommand(root: String,
                              assignments: Seq[Assignment],
                              condition: Option[Expression])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    import GraftRowLevelSql._
    val sets = assignments.flatMap { a =>
      val name = targetName(a, "UPDATE")
      a.value match {
        // aligned no-op (SET c = c): not an update of c
        case ar: AttributeReference if ar.name == name => None
        case v => Some(name -> unresolved(v, "UPDATE SET"))
      }
    }
    if (sets.isEmpty) return Seq.empty // every assignment was identity
    val pred = condition.map(unresolved(_, "UPDATE WHERE"))
      .getOrElse(lit(true))
    ManifestTable.updateWhere(spark, root, pred, sets)
    Seq.empty
  }
}

/** `MERGE INTO t USING s ON t.k = s.k WHEN ...` →
  * [[ManifestTable.mergeCoW]]: the statement's actions are folded into
  * the keyed remove/upsert pair the manifest merge applies as ONE
  * file-pruned copy-on-write commit.
  *
  * Semantics (SQL standard, first-match-wins per row):
  *  - matched target rows evaluate the matched actions' conditions in
  *    declaration order; the first that fires decides (UPDATE → a
  *    replacement row built from its assignments over the joined
  *    (target, source) row; DELETE → the key joins `removeKeys`); a
  *    matched row where NO action fires is untouched (its key reaches
  *    neither set — the merge carries it, file-pruned).
  *  - not-matched source rows evaluate the insert actions the same
  *    way; the first that fires builds the insert row (unassigned
  *    columns NULL, the SQL default).
  *  - NOT-MATCHED-BY-SOURCE target rows (the anti-join complement —
  *    no source row shares their key) evaluate the by-source actions
  *    first-match-wins on target columns alone (DELETE → removeKeys;
  *    UPDATE → a replacement row, unassigned columns keeping the
  *    target's values), folded into the SAME remove/upsert pair —
  *    all three clause families land in ONE atomic commit.
  *  - a target row matched by MORE THAN ONE source row, with any
  *    matched action present, is the standard cardinality violation —
  *    rejected loudly (delta-sized probe), never double-applied.
  * Expressions evaluate against the analyzed plans' own attribute IDs
  * (the joined frame is built from exactly those plans), so qualified
  * references (`t.c` vs `s.c`) resolve precisely — no name capture. */
case class GraftMergeCommand(root: String,
                             target: LogicalPlan, source: LogicalPlan,
                             mergeCondition: Expression,
                             matchedActions: Seq[MergeAction],
                             notMatchedActions: Seq[MergeAction],
                             notMatchedBySourceActions: Seq[MergeAction])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    import GraftRowLevelSql._
    // the conjunction-of-equalities key contract (re-derived; the rule
    // already validated the whole statement at analysis)
    val keyPairs = mergeKeysOf(target, source, mergeCondition)
    val tKeys = keyPairs.map(_._1)
    val keyCols = tKeys.map(_.name)
    val tableFields = target.output // the table's columns, in order
    val keySel = tKeys.map(k => Bridge.column(k).as(k.name))
    // frames built from the ANALYZED plans: every action expression's
    // attribute IDs resolve against these exact outputs. The SOURCE is
    // materialized ONCE (Delta's merge does the same): it is delta-
    // sized by the merge contract and otherwise re-evaluates per
    // consumer — the matched join, the not-matched anti-join, and the
    // by-source anti-join each recompute whatever plan (aggregates,
    // unions, views) produced it. localCheckpoint keeps the analyzed
    // output attribute ids, so every action expression still resolves.
    // The TARGET is deliberately NOT materialized — it is corpus-sized
    // at scale and each consumer reads it as a plain file-pruned scan.
    val targetDF = Bridge.ofRows(spark, target)
    val sourceDF = Bridge.ofRows(spark, source).localCheckpoint()
    def condCol(c: Option[Expression]): Column =
      coalesce(c.map(Bridge.column).getOrElse(lit(true)), lit(false))
    // first-match-wins action index over a frame (-1 = untouched)
    def actionIdx(actions: Seq[MergeAction]): Column =
      actions.zipWithIndex.foldRight(lit(-1): Column) {
        case ((a, i), acc) =>
          when(condCol(a.condition), lit(i)).otherwise(acc)
      }
    // one replacement/insert row in table-column order: assignments
    // win, matched-UPDATE falls back to the target's current value,
    // INSERT falls back to NULL (the SQL default)
    def rowOf(assigns: Seq[Assignment], matchedUpdate: Boolean,
              what: String): Seq[Column] = {
      val byName = assigns.map(a => targetName(a, what) -> a.value).toMap
      tableFields.map { f =>
        byName.get(f.name) match {
          case Some(v) =>
            Bridge.column(v).cast(f.dataType).as(f.name)
          case None if matchedUpdate =>
            Bridge.column(f).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }
    }
    // a per-ROW identity on the target side: the SQL cardinality rule
    // is about target ROWS (one row hit by two source rows = error),
    // and a DUPLICATE-KEYED target (legal to match once per row in
    // SQL) is a separate case the keyed rewrite cannot express — the
    // two must be told apart, and key-value group counts conflate
    // them. The checkpoint freezes the nondeterministic ids ONCE, at
    // the join — matched and both probes must read the SAME ids.
    val joinedAll = targetDF
      .withColumn("__graft_tid", monotonically_increasing_id())
      .join(sourceDF, Bridge.column(mergeCondition), "inner")
      .localCheckpoint() // delta-sized (source hits only); read 5x
    val mIdx = actionIdx(matchedActions)
    val matched = joinedAll.withColumn("__graft_action", mIdx)
      .where(col("__graft_action") >= 0)
    if (matchedActions.nonEmpty) {
      // BOTH cardinality probes in ONE aggregation job over the
      // checkpointed join (they read the same frozen row ids):
      // per merge key — matched-row count vs distinct matched target
      // ids (a gap = one target row hit by several source rows with a
      // firing action: the SQL cardinality violation), and distinct
      // target ids over ALL join matches (>1 with any firing action on
      // the key = a duplicate-keyed target being rewritten, which the
      // keyed rewrite would collapse — probed over ALL matches, NOT
      // `matched` alone: a duplicate whose action condition fires for
      // only ONE of the two rows leaves the other out of `matched`,
      // yet the rewrite would still remove both and insert one
      // replacement; it must reject whichever duplicate's condition
      // fired).
      val probe = joinedAll
        .withColumn("__graft_action", mIdx)
        .groupBy(keySel: _*)
        .agg(
          count(when(col("__graft_action") >= 0, 1)).as("__m"),
          countDistinct(when(col("__graft_action") >= 0,
            col("__graft_tid"))).as("__mt"),
          countDistinct(col("__graft_tid")).as("__t"))
        .where(col("__m") > col("__mt") ||
          (col("__t") > 1 && col("__m") > 0))
        .take(1)
      probe.headOption.foreach { r =>
        val m = r.getAs[Long]("__m"); val mt = r.getAs[Long]("__mt")
        if (m > mt) throw new IllegalArgumentException(
          s"MERGE cardinality violation on $root: a target row " +
            "matches multiple source rows with an applicable WHEN " +
            "MATCHED action — dedupe the source on the merge key")
        throw new UnsupportedOperationException(
          s"MERGE into $root: the target holds multiple rows with " +
            s"merge key (${keyCols.mkString(", ")}) = " +
            s"(${keyCols.indices.map(r.get).mkString(", ")}) " +
            "— the keyed copy-on-write rewrite replaces rows BY key " +
            "and would collapse them; deduplicate the target first")
      }
    }
    val deleteIdx = matchedActions.zipWithIndex.collect {
      case (_: DeleteAction, i) => i }
    val removeKeys = (if (deleteIdx.isEmpty) matched.where(lit(false))
      else matched.where(
        col("__graft_action").isin(deleteIdx.map(Int.box): _*)))
      .select(tKeys.map(k => Bridge.column(k).as(k.name)): _*)
    val updateUps = matchedActions.zipWithIndex.collect {
      case (u: UpdateAction, i) =>
        matched.where(col("__graft_action") === i)
          .select(rowOf(u.assignments, matchedUpdate = true,
            "WHEN MATCHED UPDATE"): _*)
    }
    // delta-sized (⊆ source); materialized once when any insert action
    // exists — its consumers (changed-key union, the rewrite's upsert
    // arm) would otherwise each re-run the anti-join's target scan
    val srcOnly = sourceDF.join(targetDF,
      Bridge.column(mergeCondition), "left_anti")
    val insIdx = actionIdx(notMatchedActions)
    val notMatched0 = srcOnly.withColumn("__graft_action", insIdx)
      .where(col("__graft_action") >= 0)
    val notMatched = if (notMatchedActions.isEmpty) notMatched0
      else notMatched0.localCheckpoint()
    val insertUps = notMatchedActions.zipWithIndex.collect {
      case (ins: InsertAction, i) =>
        notMatched.where(col("__graft_action") === i)
          .select(rowOf(ins.assignments, matchedUpdate = false,
            "WHEN NOT MATCHED INSERT"): _*)
    }
    // WHEN NOT MATCHED BY SOURCE: the target-side anti-join complement
    // evaluated first-match-wins on TARGET columns alone, folded into
    // the SAME remove/upsert pair — never a second statement, never a
    // second commit. The action-HIT subset is materialized once when
    // any by-source action exists: it feeds the dup-key probe, the
    // removes and the upserts, and each consumer would otherwise
    // re-run the full target×source anti-join (a corpus-sized scan
    // per consumer at 100 TB — three passes folded into one).
    val bySrcAll = targetDF.join(sourceDF,
      Bridge.column(mergeCondition), "left_anti")
    val bsIdx = actionIdx(notMatchedBySourceActions)
    val bySrcHit0 = bySrcAll.withColumn("__graft_action", bsIdx)
      .where(col("__graft_action") >= 0)
    val bySrcHit = if (notMatchedBySourceActions.isEmpty) bySrcHit0
      else bySrcHit0.localCheckpoint()
    if (notMatchedBySourceActions.nonEmpty) {
      // same honest limit as the matched side: a duplicate-keyed
      // target row being rewritten would collapse under the keyed
      // rewrite — reject whichever duplicate's condition fired (the
      // probe counts ALL anti-join rows per key, restricted to keys
      // an action hit)
      // an anti-join emits each target row at most once, so a plain
      // row count per key IS the duplicate count (no row ids needed)
      val dupKey = bySrcAll.groupBy(keySel: _*)
        .agg(count(lit(1)).as("__n"))
        .where(col("__n") > 1)
        .join(bySrcHit.select(keySel: _*).distinct(), keyCols, "left_semi")
        .take(1)
      if (dupKey.nonEmpty) throw new UnsupportedOperationException(
        s"MERGE into $root: the target holds multiple rows with " +
          s"merge key (${keyCols.mkString(", ")}) = " +
          s"(${keyCols.indices.map(dupKey.head.get).mkString(", ")}) " +
          "hit by a WHEN NOT MATCHED BY SOURCE action — the keyed " +
          "copy-on-write rewrite replaces rows BY key and would " +
          "collapse them; deduplicate the target first")
    }
    val bySrcDeleteIdx = notMatchedBySourceActions.zipWithIndex.collect {
      case (_: DeleteAction, i) => i }
    val bySrcRemoves =
      if (bySrcDeleteIdx.isEmpty) None
      else Some(bySrcHit.where(
          col("__graft_action").isin(bySrcDeleteIdx.map(Int.box): _*))
        .select(keySel: _*))
    val bySrcUps = notMatchedBySourceActions.zipWithIndex.collect {
      case (u: UpdateAction, i) =>
        bySrcHit.where(col("__graft_action") === i)
          .select(rowOf(u.assignments, matchedUpdate = true,
            "WHEN NOT MATCHED BY SOURCE UPDATE"): _*)
    }
    val allRemoveKeys = bySrcRemoves
      .map(removeKeys.unionByName(_)).getOrElse(removeKeys)
    // inserted keys may not be NULL (they could never be merged again)
    val upserts = (updateUps ++ insertUps ++ bySrcUps)
      .reduceOption(_ unionByName _)
      .getOrElse(targetDF.select(tableFields.map(f =>
        Bridge.column(f).as(f.name)): _*).where(lit(false)))
    ManifestTable.mergeCoWKeys(spark, root, keyCols, allRemoveKeys,
      upserts)
    Seq.empty
  }
}
