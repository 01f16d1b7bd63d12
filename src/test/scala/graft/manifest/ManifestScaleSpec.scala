package graft.manifest

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Manifest scale posture, pinned as tests (SURVEY §2.5 at the 100 TB end):
  * a table taking thousands of loads must keep its manifest small, fast to
  * reload, and self-compacting once data compaction retires old rowsets.
  * No Spark involved — this is pure driver-side metadata.
  */
class ManifestScaleSpec extends AnyFunSuite {

  private def meta(i: Long) = RowsetMeta(
    rowsetId = i, version = Version(i, i), relDir = s"r$i",
    numRows = 1000L, createdMs = i)

  test("10k publishes: linear file size, fast reload, gc self-compacts") {
    val root = Files.createTempDirectory("graft-manifest-scale-")
    val m = new TableManifest(root)
    val n = 10000L
    // one batch commit = one file rewrite (the 10k-partition load shape);
    // rowset-by-rowset would rewrite the file 10k times
    m.publishAll((1L to n).map(meta))
    assert(m.maxVersion == n)
    val size = Files.size(root.resolve("_manifest.json"))
    // ~150 bytes/entry declared in the Manifest scaladoc; fail if an entry
    // bloats past 300 (someone adding a fat field would trip this first)
    assert(size < n * 300, s"manifest is $size bytes for $n rowsets")

    // reload wall-clock: a driver restart over a 10k-load table must not
    // stall startup (generous bound; typical is well under a second)
    val t0 = System.nanoTime()
    val reloaded = new TableManifest(root)
    val reloadSec = (System.nanoTime() - t0) / 1e9
    assert(reloaded.visibleRowsets.size == n.toInt)
    assert(reloaded.captureConsistentVersions(1L, n).size == n.toInt)
    assert(reloadSec < 10.0, f"reload took $reloadSec%.1fs")

    // data compaction marks consumed rowsets stale (batched — one rewrite);
    // gc must shrink the FILE, not just the in-memory view — steady-state
    // size tracks visible rowsets
    reloaded.markStaleAll((1L to (n - 100L)))
    reloaded.gc()
    val compacted = Files.size(root.resolve("_manifest.json"))
    assert(compacted < size / 20,
      s"manifest only shrank $size -> $compacted after gc of 99% of rowsets")
    assert(new TableManifest(root).visibleRowsets.size == 100)
  }

  test("publishAll is all-or-nothing on duplicate ids") {
    val root = Files.createTempDirectory("graft-manifest-dup-")
    val m = new TableManifest(root)
    m.publishAll(Seq(meta(1L), meta(2L)))
    intercept[IllegalArgumentException](m.publishAll(Seq(meta(3L), meta(2L))))
    // the valid rowset in the failed batch must NOT have landed
    assert(m.visibleRowsets.map(_.rowsetId).sorted == Seq(1L, 2L))
    intercept[IllegalArgumentException](m.publishAll(Seq(meta(4L), meta(4L))))
    assert(m.visibleRowsets.size == 2)
  }

  test("publishAll refuses a VISIBLE version collision loudly (the lost " +
    "second-writer corruption becomes an error); staged rowsets are exempt") {
    val root = Files.createTempDirectory("graft-manifest-vdup-")
    val m = new TableManifest(root)
    m.publishAll(Seq(meta(1L)))
    // a second writer that derived the same maxVersion+1: refused whole
    val clash = RowsetMeta(2L, Version(1L, 1L), "r2", 10L, createdMs = 2L)
    intercept[IllegalArgumentException](m.publishAll(Seq(clash)))
    assert(m.visibleRowsets.map(_.rowsetId) == Seq(1L))
    // within one batch too
    intercept[IllegalArgumentException](m.publishAll(Seq(
      RowsetMeta(3L, Version(5L, 5L), "r3", 1L, createdMs = 3L),
      RowsetMeta(4L, Version(5L, 5L), "r4", 1L, createdMs = 4L))))
    assert(m.visibleRowsets.size == 1)
    // a STAGED rowset may carry any provisional version (activation
    // re-assigns), and a stale-but-same version is not a VISIBLE collision
    m.publishAll(Seq(RowsetMeta(5L, Version(1L, 1L), "r5", 1L,
      createdMs = 5L, pendingGroup = Some("g"))))
    m.markStale(1L)
    m.publishAll(Seq(RowsetMeta(6L, Version(1L, 1L), "r6", 1L, createdMs = 6L)))
    assert(m.visibleRowsets.map(_.rowsetId) == Seq(6L))
  }
}
