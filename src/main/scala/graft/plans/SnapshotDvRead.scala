package graft.plans

import graft.operators.ScaleOps
import graft.sources.SnapshotTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, Project, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Merge-on-read DELETION-VECTOR reads for the DSv2/SQL face: a
  * snapshot version whose manifest carries `dv:` fields must not be
  * scanned raw — the scan would resurrect every deleted row. This
  * rule replaces each READ relation over such a version with the
  * PRUNED composed read ([[graft.sources.SnapshotDvReadPlan]]):
  * clean files come back through the connector itself
  * (`subset=clean` — zone maps, Blooms and runtime join filters all
  * still plan files), DV'd files read through a v1 relation over a
  * pruning FileIndex and anti-join their (file, row_index) deletion
  * rows out. The result is projected back onto the relation's own
  * output attribute ids so the surrounding plan re-binds nothing —
  * and, per round-13's standing finding, a DV'd version no longer
  * loses manifest-grain file skipping at CDC steady state.
  *
  * DML/write TARGETS keep their relation identity — the commands
  * need the raw table (their execution paths are DV-aware inside
  * [[ScaleOps]]); only pure reads rewrite. The clean half's
  * relation carries `subset`, which this rule skips — no rewrite
  * recursion. The per-plan cost of the probe is one MEMOIZED
  * manifest header read (`#dvs:`). */
case class ResolveSnapshotDvRead(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def rels(p: LogicalPlan): Seq[DataSourceV2Relation] =
    p.collect { case r: DataSourceV2Relation => r }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val writeTargets: Set[DataSourceV2Relation] = plan.collect {
      case d: DeleteFromTable => rels(d.table)
      case u: UpdateTable => rels(u.table)
      case m: MergeIntoTable => rels(m.targetTable)
      case w: V2WriteCommand => rels(w.table)
      case i: InsertIntoStatement => rels(i.table)
    }.flatten.toSet
    plan.resolveOperators {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[SnapshotTable] &&
            !writeTargets.contains(r) && {
              val t = r.table.asInstanceOf[SnapshotTable]
              t.subset.isEmpty && t.pinnedVersion >= 1 &&
                ScaleOps.snapshotHasDvs(spark, t.root, t.pinnedVersion)
            } =>
        val t = r.table.asInstanceOf[SnapshotTable]
        val child = graft.sources.SnapshotDvReadPlan
          .composedRead(spark, t.root, t.pinnedVersion, t.statsCol)
          .queryExecution.analyzed
        Project(r.output.map { a =>
          val src = child.output
            .find(_.name.equalsIgnoreCase(a.name))
            .getOrElse(throw new IllegalStateException(
              s"DV-aware read of ${t.root} v${t.pinnedVersion} lost column " +
                s"'${a.name}'"))
          Alias(src, a.name)(exprId = a.exprId)
        }, child)
    }
  }
}
