package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias, Union}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.engine.OlapEngine

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

  /** A matched scan: leaf parquet paths + filters collected on the way down,
    * plus any (sourceName, outputName) column renames the plan applies.
    * Renames appear because [[OlapEngine.scan]] maps each rowset's PHYSICAL
    * former column name to the current declared name before the union
    * (RENAME COLUMN is metadata-only) — but a plan-side alias could equally
    * be a USER's relabeling, which would make name-based rewrite matching
    * unsound (alias c AS a would serve a's rollup with c's data). Rewrite
    * rules must therefore validate every collected pair through
    * [[renamesOk]] before treating the scan as "the engine table itself".
    */
  final case class Scan(leafPaths: Set[String], filters: Seq[Expression],
      renames: Set[(String, String)] = Set.empty)

  /** Are these alias pairs exactly the engine's OWN physical→current rename
    * projections for `db.table`? Each source name must be a registered
    * former name mapping to that output name, and must NOT be a live column
    * of the current schema (a live column aliased to another name is a user
    * relabeling, never the engine's era-mapping — this closes the corner
    * where an old name is later re-used by ADD COLUMN).
    */
  def renamesOk(eng: OlapEngine, db: String, table: String,
      renames: Set[(String, String)]): Boolean =
    renames.isEmpty || {
      val td = eng.catalog.getTable(db, table).getOrElse(return false)
      renames.forall { case (o, n) =>
        td.renamedColumns.get(o).contains(n) &&
          !td.schema.columns.exists(_.name == o)
      }
    }

  private def normalizeAttrs(e: Expression): Expression = e.transform {
    case a: AttributeReference =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(a.name)
  }

  def baseScan(plan: LogicalPlan): Option[Scan] = plan match {
    case p: Project if p.projectList.forall {
        case _: AttributeReference => true
        case Alias(_: AttributeReference, _) => true
        case _ => false
      } =>
      val aliased = p.projectList.collect {
        case al @ Alias(ar: AttributeReference, _) => (ar.name, al.name)
      }.toSet
      baseScan(p.child).map(s => s.copy(renames = s.renames ++ aliased))
    case s: SubqueryAlias => baseScan(s.child)
    case f: Filter if f.condition.deterministic =>
      baseScan(f.child).map(s => s.copy(filters = f.condition +: s.filters))
    case u: Union if !u.byName =>
      val parts = u.children.map(baseScan)
      if (parts.exists(_.isEmpty)) None
      else {
        val scans = parts.map(_.get)
        val paths = scans.flatMap(_.leafPaths).toSet
        // Predicate pushdown clones a union-level filter into every branch;
        // hoist it back iff every branch carries the SAME conditions (compared
        // with exprIds normalized away — branches bind distinct attr ids).
        // Renames union across branches: each physical-name era aliases only
        // in its own branches (new-era rowsets project the name directly).
        val normalized = scans.map(_.filters.map(normalizeAttrs))
        if (normalized.distinct.size == 1)
          Some(Scan(paths, scans.head.filters,
            scans.flatMap(_.renames).toSet))
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

  def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** Comparison form for filter conjuncts: constant subtrees folded FIRST (an
    * analyzed predicate still carries e.g. `cast(50 as bigint)` where the
    * optimized query side already folded it to `50L` — folding must run while
    * the tree is still resolved), then attrs replaced by name so distinct
    * exprIds compare equal.
    */
  def normalize(e: Expression): Expression = {
    val folded = e.transformUp {
      case f if f.deterministic && f.references.isEmpty &&
          !f.isInstanceOf[Literal] && f.resolved && f.foldable =>
        try Literal.create(f.eval(null), f.dataType) catch { case _: Exception => f }
    }
    folded.transform {
      case a: AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(a.name)
    }
  }

  // latest snapshot's conjuncts per table; a marker set can only change with
  // a version bump, so one live entry per table suffices
  private val snapCache =
    TrieMap.empty[(String, String, String), (Long, Option[Seq[Expression]])]

  /** Filter conjuncts the bare CURRENT snapshot scan itself carries — the
    * DELETE-WHERE masks [[graft.engine.OlapEngine.scan]] applies over older
    * rowsets. A rollup/MV materialized at the same manifest version was built
    * over this exact scan, so its stored rows already reflect them: rewrite
    * rules CONSUME these conjuncts from a matching query plan (and must
    * refuse plans that lack them — a stale pre-delete DataFrame still reads
    * the same parquet leaves but means different rows).
    *
    * Some(Nil) when the table has no delete markers (the overwhelmingly
    * common case — gated on the manifest before any plan is built). None when
    * markers exist but the snapshot scan itself doesn't reduce to one hoisted
    * conjunct set (rowsets loaded after the marker carry a different mask per
    * branch) — the caller must refuse the rewrite.
    */
  def snapshotConjuncts(eng: OlapEngine, db: String,
      table: String): Option[Seq[Expression]] = {
    val m = eng.manifest(db, table)
    if (!m.visibleRowsets.exists(_.isDeleteMarker)) return Some(Nil)
    val key = (eng.warehouse.toString, db, table)
    snapCache.get(key) match {
      case Some((v, c)) if v == m.maxVersion => c
      case _ =>
        // optimizedPlan, not analyzed: folding the per-rowset version literal
        // into each union branch is what reduces the mask to the same
        // `NOT coalesce(pred, false)` shape the query side carries
        val plan = eng.scan(db, table).queryExecution.optimizedPlan
        val c = baseScan(plan).map(_.filters.flatMap(splitAnd).map(normalize))
        snapCache(key) = (m.maxVersion, c)
        c
    }
  }
}
