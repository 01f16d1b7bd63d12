package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias, Union}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Reduces a logical subtree to "a scan of these parquet leaf paths with these
  * residual filters" — the shared precondition of every materialized-rewrite
  * rule ([[RollupRewrite]], [[JoinMvRewrite]]): a rewrite is exact only when
  * the plan provably reads the engine table's CURRENT covering rowset files,
  * nothing more, nothing less.
  *
  * Only shapes that compute "rows of the underlying parquet, columns passed
  * through by name" qualify: Project-of-attributes, SubqueryAlias,
  * deterministic Filter, and positional Union (the engine's multi-rowset
  * snapshot read).
  */
object ScanMatch {

  /** A matched scan: leaf parquet paths + filters collected on the way down. */
  final case class Scan(leafPaths: Set[String], filters: Seq[Expression])

  private def normalizeAttrs(e: Expression): Expression = e.transform {
    case a: AttributeReference =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(a.name)
  }

  def baseScan(plan: LogicalPlan): Option[Scan] = plan match {
    case p: Project if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      baseScan(p.child)
    case s: SubqueryAlias => baseScan(s.child)
    case f: Filter if f.condition.deterministic =>
      baseScan(f.child).map(s => Scan(s.leafPaths, f.condition +: s.filters))
    case u: Union if !u.byName =>
      val parts = u.children.map(baseScan)
      if (parts.exists(_.isEmpty)) None
      else {
        val scans = parts.map(_.get)
        val paths = scans.flatMap(_.leafPaths).toSet
        // Predicate pushdown clones a union-level filter into every branch;
        // hoist it back iff every branch carries the SAME conditions (compared
        // with exprIds normalized away — branches bind distinct attr ids).
        val normalized = scans.map(_.filters.map(normalizeAttrs))
        if (normalized.distinct.size == 1) Some(Scan(paths, scans.head.filters))
        else None
      }
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          Some(Scan(fs.location.rootPaths.map(_.toUri.getPath).toSet, Nil))
        case _ => None
      }
    case _ => None
  }
}
