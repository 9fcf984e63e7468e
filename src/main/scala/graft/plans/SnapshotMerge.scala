package graft.plans

import graft.operators.ScaleOps
import graft.sources.SnapshotTable
import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And => CatalystAnd, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** SQL `MERGE INTO` and `UPDATE` on snapshot-catalog tables,
  * resolved to the engine's own copy-on-write rewrites
  * ([[ScaleOps.mergeIntoSnapshot]] — the s14 write path — and
  * [[ScaleOps.updateWhereSnapshot]], commit protocol and all).
  *
  * Spark's generic row-level-operation rewrite needs
  * SupportsRowLevelOperations; the store instead routes MERGE through
  * its OWN rewrite — zone-map-planned touched files, key-grain anti
  * join, untouched manifest lines carried forward verbatim — which is
  * strictly better-informed than a generic scan-and-replace (it reads
  * only the files an update key can land in). The supported statement
  * is the canonical upsert the engine's merge semantics define:
  *
  * {{{
  *   MERGE INTO cat.t [AS t] USING src [AS s] ON t.k = s.k
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * (with `t.k = s.k` any single equi-key whose two sides name the
  * same column). Conditional clauses, DELETE actions, partial SET
  * lists and NOT MATCHED BY SOURCE are refused LOUDLY — silently
  * approximating a different MERGE would commit wrong rows. The rule
  * fires during resolution, before Spark's RewriteMergeIntoTable can
  * reject the table for not implementing SupportsRowLevelOperations. */
case class ResolveSnapshotMerge(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      // SQL UPDATE — the same copy-on-write rewrite discipline as
      // SupportsDelete: condition → pushed-filter constraints →
      // candidate files; assignments applied only to matching rows.
      case u: UpdateTable if snapshotTarget(u.table).isDefined &&
          u.table.resolved && u.assignments.forall(_.resolved) &&
          u.condition.forall(_.resolved) =>
        val table = snapshotTarget(u.table).get
        val sets = u.assignments.map {
          case Assignment(k: AttributeReference, v) => k.name -> v
          case a => refuse(
            s"UPDATE SET targets must be top-level columns, got: ${a.sql}")
        }
        UpdateSnapshotCommand(table.root, table.statsCol, sets,
          u.condition)

      case m: MergeIntoTable if snapshotTarget(m.targetTable).isDefined &&
          m.targetTable.resolved && m.sourceTable.resolved =>
        val table = snapshotTarget(m.targetTable).get
        val keyCol = equiKey(m).getOrElse(refuse(
          "ON condition must be a single equi-join on one column " +
            s"present on both sides, got: ${m.mergeCondition.sql}"))
        if (!isUpsertShape(m.matchedActions, m.notMatchedActions,
            m.notMatchedBySourceActions))
          refuse("only the canonical upsert is supported — " +
            "WHEN MATCHED THEN UPDATE SET * " +
            "WHEN NOT MATCHED THEN INSERT * (no clause conditions, " +
            "no DELETE, no partial SET, no NOT MATCHED BY SOURCE)")
        MergeIntoSnapshotCommand(table.root, keyCol, m.sourceTable,
          m.withSchemaEvolution)
    }

  private def refuse(why: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft snapshot DML: $why")

  /** The target resolved to a snapshot-catalog table (under any
    * stack of aliases). */
  private def snapshotTarget(p: LogicalPlan): Option[SnapshotTable] =
    p.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[SnapshotTable] =>
        r.table.asInstanceOf[SnapshotTable]
    }

  /** The merge key: `ON t.k = s.k` with one side a target attribute,
    * the other a source attribute, both naming the same column. */
  private def equiKey(m: MergeIntoTable): Option[String] = {
    val tIds = m.targetTable.outputSet
    val sIds = m.sourceTable.outputSet
    m.mergeCondition match {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if a.name.equalsIgnoreCase(b.name) &&
            ((tIds.contains(a) && sIds.contains(b)) ||
              (tIds.contains(b) && sIds.contains(a))) =>
        Some(if (tIds.contains(a)) a.name else b.name)
      case _ => None
    }
  }

  /** UPDATE SET * / INSERT * with no clause conditions — matched both
    * before star expansion (UpdateStarAction/InsertStarAction) and
    * after (UpdateAction/InsertAction whose assignments are all
    * same-name column identities), since the analyzer's fixed point
    * may expand the stars before this rule fires. */
  private def isUpsertShape(matched: Seq[MergeAction],
      notMatched: Seq[MergeAction],
      bySource: Seq[MergeAction]): Boolean = {
    def identityAssigns(as: Seq[Assignment]): Boolean =
      as.forall {
        case Assignment(k: AttributeReference, v: AttributeReference) =>
          k.name.equalsIgnoreCase(v.name)
        case Assignment(k, v) => // unresolved-yet star expansion
          !k.resolved || !v.resolved
      }
    val updOk = matched match {
      case Seq(UpdateStarAction(None)) => true
      case Seq(UpdateAction(None, as, _)) => identityAssigns(as)
      case _ => false
    }
    val insOk = notMatched match {
      case Seq(InsertStarAction(None)) => true
      case Seq(InsertAction(None, as)) => identityAssigns(as)
      case _ => false
    }
    updOk && insOk && bySource.isEmpty
  }
}

/** The resolved MERGE as a driver command: materialize the source
  * plan, hand it to the engine's copy-on-write upsert. The command
  * is leaf-shaped (the source rides as an inner child) so the
  * analyzer stops rewriting it; the heavy lifting — zone-map file
  * planning, key-grain anti join, race-safe commit — happens inside
  * [[ScaleOps.mergeIntoSnapshot]] at execution. */
case class MergeIntoSnapshotCommand(root: String, keyCol: String,
    source: LogicalPlan, evolveSchema: Boolean)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val updates = org.apache.spark.sql.graft.SqlShims.ofRows(session, source)
    ScaleOps.mergeIntoSnapshot(session, root, keyCol, updates,
      evolveSchema = evolveSchema)
    Seq.empty
  }
}

/** The resolved UPDATE as a driver command — the copy-on-write
  * rewrite behind SQL `UPDATE cat.t SET … WHERE …`, sharing the
  * DELETE path's candidate planning: each WHERE conjunct must
  * translate to a data-source Filter (the language the scan builder
  * maps into stat-space constraints — reused verbatim, so UPDATE
  * rewrites exactly the files a pruned read would open), and the
  * SET/WHERE expressions are re-rooted on column NAMES before
  * evaluating over the rewrite scan (their original attribute ids
  * belong to the query's relation, not the rewrite's). */
case class UpdateSnapshotCommand(root: String, statsCol: Option[String],
    sets: Seq[(String, Expression)], condition: Option[Expression])
    extends LeafRunnableCommand {

  import org.apache.spark.sql.graft.SqlShims

  /** AttributeReference → by-name unresolved attribute, so the
    * expression resolves against the rewrite's own scan. */
  private def byName(e: Expression): Expression = e.transform {
    case a: AttributeReference =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        .quoted(a.name)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case CatalystAnd(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def run(session: SparkSession): Seq[Row] = {
    val exprs = condition.toSeq.flatMap(conjuncts)
    val translated = exprs.map(e => e -> SqlShims.translateFilter(e))
    val bad = translated.collect { case (e, None) => e.sql }
    if (bad.nonEmpty) throw new UnsupportedOperationException(
      "graft snapshot UPDATE: WHERE clause not row-level translatable " +
        s"(rewrite it in pushable predicates): ${bad.mkString(", ")}")
    val pred = condition.map(e => SqlShims.column(byName(e)))
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val vs = ScaleOps.snapshotVersions(session, root)
    require(vs.nonEmpty, s"no committed snapshots under $root")
    val schema = ScaleOps.snapshotSchema(session, root, vs.last)
      .getOrElse(ScaleOps.readSnapshot(session, root, Some(vs.last)).schema)
    val sb = new graft.sources.SnapshotScanBuilder(
      root, vs.last, schema, statsCol)
    sb.pushFilters(translated.flatMap(_._2).toArray)
    ScaleOps.updateWhereSnapshot(session, root, pred,
      sets.map { case (c, e) => c -> SqlShims.column(byName(e)) },
      sb.plannedConstraints)
    Seq.empty
  }
}
