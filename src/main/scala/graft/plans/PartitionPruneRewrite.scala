package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** Transparent PARTITION pruning — the query-time completion of the engine's
  * Range/List partition routing (reference src/partition.rs:172-189, which
  * routes writes but never prunes reads): a filter on the PARTITION COLUMN
  * (`=`, `<`, `<=`, `>`, `>=`, `IN`) maps to the set of partitions whose
  * range/values can intersect it, and the scan gets a `__graft_part IN (…)`
  * filter — so whole partition directories are skipped before any file
  * opens. [[graft.engine.OlapEngine.scanPartitions]] already does this for
  * callers who name partitions; this rule serves the far more common query
  * (`WHERE order_date < '1997-01-01'`) with zero API.
  *
  * Correctness contract: the engine routes by STRING comparison of the cast
  * partition key (src/partition.rs:180-184 semantics), so the rule compares
  * in the same string space and only registers columns whose string order
  * equals their typed order (string / date / timestamp — ISO forms). The
  * computed partition set is a SUPERSET of the partitions that can hold
  * matching rows (boundary overlaps stay included); the original row filter
  * still runs, so pruning can never change an answer.
  */
object PartitionPruneRewrite extends Rule[LogicalPlan] {

  private val PartCol = "__graft_part"

  /** One partition's routing slot: [lower, upper) in routing-string space
    * (None = unbounded), or an explicit value list.
    */
  final case class Slot(name: String, lower: Option[String], upper: Option[String],
      values: Seq[String])

  final case class Entry(tableRoot: String, partitionCol: String, slots: Seq[Slot])

  private val entries = TrieMap.empty[String, Entry]

  /** Called by OlapEngine.createTable / partition lifecycle for partitioned
    * tables with a string-order-safe partition column.
    */
  def register(e: Entry): Unit = entries(e.tableRoot) = e

  def clear(): Unit = entries.clear()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (entries.isEmpty) plan
    else plan.transformUp {
      // match the relation directly, or through a pruning filter another
      // graft rule (bucket pruning) already injected below the user filter
      case f @ Filter(cond, lr: LogicalRelation) =>
        try prune(cond, lr).map(pf => Filter(cond, Filter(pf, lr))).getOrElse(f)
        catch { case e: Exception => // never fail a query over a missed prune
          logWarning(s"partition prune bailed: $e"); f }
      case f @ Filter(cond, inner @ Filter(ic, lr: LogicalRelation))
          if ic.references.forall(_.name.startsWith("__graft_")) &&
            !ic.references.exists(_.name == PartCol) =>
        try prune(cond, lr).map(pf => Filter(cond, Filter(pf, inner))).getOrElse(f)
        catch { case e: Exception =>
          logWarning(s"partition prune bailed: $e"); f }
    }

  /** Routing-string form of a literal: the same `cast(key as string)` the
    * write path used (UTC, matching the engine session).
    */
  private def routingString(l: Literal): Option[String] =
    if (l.value == null) None
    else Option(Cast(l, StringType, Some("UTC")).eval(null)).map(_.toString)

  /** Can a slot contain a value satisfying `op lit`? Conservative: true
    * unless provably disjoint in routing-string space.
    */
  private def mayMatch(s: Slot, op: String, lit: String): Boolean =
    if (s.values.nonEmpty) op match {
      case "=" => s.values.contains(lit)
      case _ => true // range predicates over list partitions: keep all
    } else op match {
      case "=" => s.lower.forall(_ <= lit) && s.upper.forall(lit < _)
      case "<" => s.lower.forall(_ < lit)
      case "<=" => s.lower.forall(_ <= lit)
      case ">" | ">=" => s.upper.forall(lit < _)
      case _ => true
    }

  private def prune(cond: Expression, lr: LogicalRelation): Option[Expression] = {
    if (cond.references.exists(_.name == PartCol)) return None
    val fs = lr.relation match {
      case h: HadoopFsRelation if h.partitionSchema.fieldNames.contains(PartCol) => h
      case _ => return None
    }
    val parents = fs.location.rootPaths.map(p => Option(p.getParent).map(_.toUri.getPath))
    val entry = parents.distinct match {
      case Seq(Some(root)) => entries.get(root).getOrElse(return None)
      case _ => return None
    }
    val partAttr = lr.output.find(_.name == PartCol).getOrElse(return None)

    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // intersect the allowed-slot sets across every conjunct on the column
    var allowed: Option[Set[String]] = None
    def restrict(pred: Slot => Boolean): Unit = {
      val s = entry.slots.filter(pred).map(_.name).toSet
      allowed = Some(allowed.fold(s)(_ intersect s))
    }
    conjuncts(cond).foreach {
      case EqualTo(a: AttributeReference, l: Literal) if a.name == entry.partitionCol =>
        routingString(l).foreach(v => restrict(mayMatch(_, "=", v)))
      case EqualTo(l: Literal, a: AttributeReference) if a.name == entry.partitionCol =>
        routingString(l).foreach(v => restrict(mayMatch(_, "=", v)))
      case LessThan(a: AttributeReference, l: Literal) if a.name == entry.partitionCol =>
        routingString(l).foreach(v => restrict(mayMatch(_, "<", v)))
      case LessThanOrEqual(a: AttributeReference, l: Literal) if a.name == entry.partitionCol =>
        routingString(l).foreach(v => restrict(mayMatch(_, "<=", v)))
      case GreaterThan(a: AttributeReference, l: Literal) if a.name == entry.partitionCol =>
        routingString(l).foreach(v => restrict(mayMatch(_, ">", v)))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) if a.name == entry.partitionCol =>
        routingString(l).foreach(v => restrict(mayMatch(_, ">=", v)))
      // reversed comparisons: lit OP col ≡ col OP' lit
      case LessThan(l: Literal, a: AttributeReference) if a.name == entry.partitionCol =>
        routingString(l).foreach(v => restrict(mayMatch(_, ">", v)))
      case GreaterThan(l: Literal, a: AttributeReference) if a.name == entry.partitionCol =>
        routingString(l).foreach(v => restrict(mayMatch(_, "<", v)))
      case In(a: AttributeReference, ls) if a.name == entry.partitionCol &&
          ls.nonEmpty && ls.forall(_.isInstanceOf[Literal]) =>
        val vs = ls.flatMap(l => routingString(l.asInstanceOf[Literal]))
        if (vs.size == ls.size)
          restrict(s => vs.exists(v => mayMatch(s, "=", v)))
      case _ => ()
    }
    allowed match {
      // every candidate partition excluded (e.g. the range was dropped):
      // nothing can match — rows physically present are delete-masked anyway
      case Some(names) if names.isEmpty => Some(Literal(false, BooleanType))
      // only rewrite when something is actually pruned
      case Some(names) if names.size < entry.slots.size =>
        Some(In(partAttr, names.toSeq.sorted.map(n => Literal(n))))
      case _ => None
    }
  }
}
