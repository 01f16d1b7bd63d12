package graft.manifest

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** GroupLedger scale posture (round-9 verdict item 1, pinned as tests): the
  * ledger must stay O(in-flight groups), never O(lifetime commits). The
  * streaming LM fold commits one group per micro-batch — a year of 1-minute
  * batches is ~500k commits — so an unretired ledger would rewrite a
  * half-megabyte JSON on the driver every minute, quadratic cumulative I/O.
  * With retirement sweeps interleaved (the engine's `sweepGroups` runs one
  * per maintenance tick) both the FILE SIZE and the PER-COMMIT BYTES stay
  * bounded by the sweep interval, not by history. No Spark involved — pure
  * driver-side metadata, like `ManifestScaleSpec`.
  */
class LedgerScaleSpec extends AnyFunSuite {

  test("10k commit+retire cycles: bounded file size and bounded per-commit " +
    "bytes (sweep every 100 commits)") {
    val root = Files.createTempDirectory("graft-ledger-scale-")
    val l = new GroupLedger(root)
    val path = root.resolve("_group_commits.json")
    var maxSize = 0L
    var inFlight = Set.empty[String]
    for (i <- 1 to 10000) {
      val g = s"grp-$i"
      l.commit(g)
      inFlight += g
      maxSize = math.max(maxSize, Files.size(path))
      if (i % 100 == 0) { l.retire(inFlight); inFlight = Set.empty }
    }
    // 100 in-flight ids ≈ 1 KB; 10k unretired ids would be ~90 KB. The
    // bound is the sweep interval, with headroom, never the lifetime count.
    assert(maxSize < 8 * 1024,
      s"ledger peaked at $maxSize bytes over 10k commits — retirement is not bounding it")
    l.retire(inFlight)
    assert(Files.size(path) < 64, s"drained ledger is ${Files.size(path)} bytes")
    assert(new GroupLedger(root).committed.isEmpty)
  }

  test("retire is durable, idempotent, and ignores unknown ids") {
    val root = Files.createTempDirectory("graft-ledger-retire-")
    val l = new GroupLedger(root)
    l.commit("a"); l.commit("b"); l.commit("c")
    assert(l.retire(Set("b", "nope")) == 1)
    assert(l.retire(Set("b")) == 0) // already gone
    assert(new GroupLedger(root).committed === Set("a", "c"))
    // a retired id can re-commit (ids are UUIDs in practice — this pins the
    // mechanism, not a recommendation)
    l.commit("b")
    assert(new GroupLedger(root).committed === Set("a", "b", "c"))
  }

  test("crash-replay: retirement never orphans a stage, because the heal " +
    "at manifest load PERSISTS the stripped marker first") {
    val root = Files.createTempDirectory("graft-ledger-heal-")
    val tableRoot = root.resolve("db").resolve("t")
    // stage a rowset under group gX and commit gX in the ledger — the
    // crash-after-ledger-commit state
    val m = new TableManifest(tableRoot)
    m.publishAll(Seq(RowsetMeta(1L, Version(0L, 0L), "r1", 5L,
      createdMs = 1L, pendingGroup = Some("gX"))))
    val ledger = new GroupLedger(root)
    ledger.commit("gX")
    // next load self-heals AND persists; only then is retirement safe
    val healed = new TableManifest(tableRoot, () => ledger.committed)
    assert(healed.visibleRowsets.map(_.rowsetId) == Seq(1L))
    ledger.retire(Set("gX"))
    // a third load WITHOUT the ledger id still serves the rowset — the
    // on-disk manifest no longer references gX
    val after = new TableManifest(tableRoot)
    assert(after.visibleRowsets.map(_.rowsetId) == Seq(1L))
    assert(after.pendingGroupIds.isEmpty)
  }
}
