package graft.manifest

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Covering-path / hole semantics (reference: src/tablet.rs:38-69). */
class VersionGraphSpec extends AnyFunSuite {

  test("single edge covers its own interval") {
    val g = new VersionGraph
    g.addEdge(Version(0, 1))
    assert(g.findCoveringPath(0, 1).contains(Seq(Version(0, 1))))
    assert(!g.hasVersionHoles(0, 1))
  }

  test("two adjacent rowsets cover the union interval") {
    val g = new VersionGraph
    g.addEdge(Version(0, 1))
    g.addEdge(Version(2, 3))
    assert(g.findCoveringPath(0, 3).contains(Seq(Version(0, 1), Version(2, 3))))
  }

  test("hole detected when a version interval is missing") {
    // mirrors the reference example: rowsets at [0,1],[2,3],[6,7] -> [0,7] has
    // a hole at [4,5] (examples/basic_usage.rs:275-283)
    val g = new VersionGraph
    g.addEdge(Version(0, 1))
    g.addEdge(Version(2, 3))
    g.addEdge(Version(6, 7))
    assert(g.hasVersionHoles(0, 7))
    assert(g.hasVersionHoles(0, 100))
    assert(!g.hasVersionHoles(0, 3))
    assert(!g.hasVersionHoles(6, 7))
  }

  test("longest-edge-first: a compacted rowset is preferred over fragments") {
    val g = new VersionGraph
    g.addEdge(Version(0, 1))
    g.addEdge(Version(2, 3))
    g.addEdge(Version(0, 3)) // compacted replacement
    assert(g.findCoveringPath(0, 3).contains(Seq(Version(0, 3))))
  }

  test("removeEdge reopens a hole") {
    val g = new VersionGraph
    g.addEdge(Version(0, 1))
    g.addEdge(Version(2, 3))
    g.removeEdge(Version(2, 3))
    assert(g.hasVersionHoles(0, 3))
    assert(!g.hasVersionHoles(0, 1))
  }

  test("property: any contiguous partition of [0,n] is coverable; dropping any piece opens a hole") {
    val rnd = new Random(42)
    for (_ <- 1 to 200) {
      val k = 1 + rnd.nextInt(8)
      val bounds = Seq.fill(k)(rnd.nextInt(30).toLong).distinct.sorted
      val starts = 0L +: bounds.map(_ + 1)
      val ends = bounds :+ (bounds.lastOption.getOrElse(0L) + 3)
      val versions = starts.zip(ends).map { case (s, e) => Version(s, e) }
      val g = new VersionGraph
      versions.foreach(g.addEdge)
      val hi = versions.last.end
      assert(!g.hasVersionHoles(0, hi))
      assert(g.findCoveringPath(0, hi).get == versions)
      if (versions.size > 1) {
        val victim = versions(rnd.nextInt(versions.size))
        g.removeEdge(victim)
        assert(g.hasVersionHoles(0, hi), s"dropping $victim must open a hole")
      }
    }
  }
}
