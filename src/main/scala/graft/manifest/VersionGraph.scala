package graft.manifest

import scala.collection.mutable

/** Version interval of an immutable rowset, inclusive on both ends
  * (reference: src/common.rs:17-26).
  */
final case class Version(start: Long, end: Long) {
  require(start <= end, s"bad version [$start,$end]")
}

/** DAG of version edges per tablet supporting snapshot reads and hole
  * detection (reference: src/tablet.rs:17-70). An edge `start -> end+1`
  * represents a rowset covering `[start, end]`; a snapshot read of `[lo, hi]`
  * is a path from `lo` to `hi+1`.
  *
  * This is driver-side metadata (a few edges per tablet) — it never touches
  * executor data paths, so plain Scala is the right tool at any scale; the
  * data volume is proportional to the number of loads, not rows.
  */
final class VersionGraph {
  // node -> sorted (desc) set of reachable next-nodes; longest-edge-first like
  // the reference's neighbor ordering (src/tablet.rs:46-48) so the BFS prefers
  // compacted (wide) rowsets over many small ones.
  private val edges = mutable.Map.empty[Long, mutable.SortedSet[Long]]

  def addEdge(v: Version): Unit = synchronized {
    edges.getOrElseUpdate(v.start, mutable.SortedSet.empty[Long](Ordering[Long].reverse))
      .add(v.end + 1)
  }

  def removeEdge(v: Version): Unit = synchronized {
    edges.get(v.start).foreach { s =>
      s.remove(v.end + 1)
      if (s.isEmpty) edges.remove(v.start)
    }
  }

  /** BFS from `lo` preferring longest edges; returns the rowset versions whose
    * concatenation exactly covers `[lo, hi]`, or None if a version is missing
    * (reference: src/tablet.rs:38-65).
    */
  def findCoveringPath(lo: Long, hi: Long): Option[Seq[Version]] = synchronized {
    val target = hi + 1
    val prev = mutable.Map.empty[Long, Long] // node -> predecessor
    val queue = mutable.Queue(lo)
    val seen = mutable.Set(lo)
    var found = false
    while (queue.nonEmpty && !found) {
      val cur = queue.dequeue()
      if (cur == target) found = true
      else edges.getOrElse(cur, mutable.SortedSet.empty[Long]).foreach { nxt =>
        if (nxt <= target && !seen.contains(nxt)) {
          seen.add(nxt); prev(nxt) = cur; queue.enqueue(nxt)
        }
      }
    }
    if (!found) None
    else {
      val path = mutable.ListBuffer.empty[Version]
      var cur = target
      while (cur != lo) {
        val p = prev(cur)
        path.prepend(Version(p, cur - 1))
        cur = p
      }
      Some(path.toSeq)
    }
  }

  /** True if `[lo, hi]` cannot be covered (reference: src/tablet.rs:67-69). */
  def hasVersionHoles(lo: Long, hi: Long): Boolean = findCoveringPath(lo, hi).isEmpty
}
