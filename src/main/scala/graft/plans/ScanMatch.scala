package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Expression, Literal}
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
