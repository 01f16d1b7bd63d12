package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.manifest.{GroupLedger, RowsetMeta, TableManifest, Version}
import graft.model._

/** Cross-table load groups: staged loads are invisible everywhere until the
  * group ledger's single atomic rename commits the WHOLE group; crash
  * before = nothing moved (reapable), crash after = every table self-heals
  * to committed at the next manifest load.
  */
class LoadGroupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkEngine(): OlapEngine =
    mkEngineAt(Files.createTempDirectory("graft-grpspec-wh-"))

  /** The DDL replay a restarted deployment runs (the catalog is in-memory;
    * manifests and data reload from the warehouse).
    */
  private def mkEngineAt(warehouse: java.nio.file.Path): OlapEngine = {
    val eng = new OlapEngine(spark, warehouse)
    eng.createDatabase("g")
    for (t <- Seq("a", "b"))
      eng.createTable(TableDef(
        db = "g", name = t,
        schema = TableSchema(KeysType.Unique, Seq(
          ColumnSpec.key("k", LongType),
          ColumnSpec.value("v", LongType))),
        bucketColumn = Some("k"), numBuckets = 2))
    eng
  }

  private def rows(eng: OlapEngine, t: String): Set[(Long, Long)] =
    eng.scan("g", t).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def kv(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("k", "v")
  }

  test("staged loads are invisible to scans, compaction scoring and time " +
    "travel until commit; the commit makes BOTH tables move at once") {
    val eng = mkEngine()
    eng.ingest("g", "a", kv(1L -> 10L))
    eng.ingest("g", "b", kv(1L -> 100L))
    val g = eng.newLoadGroup()
    eng.ingest("g", "a", kv(2L -> 20L), group = Some(g))
    eng.mergeInto("g", "b",
      kv(1L -> 0L).withColumn("__graft_del", lit(true)),
      "__graft_del", group = Some(g))
    // staged: nothing visible, versions unmoved, score unmoved
    assert(rows(eng, "a") === Set(1L -> 10L))
    assert(rows(eng, "b") === Set(1L -> 100L))
    assert(eng.manifest("g", "a").maxVersion == 0L)
    assert(eng.manifest("g", "a").compactionScore == 1.0)
    assert(eng.manifest("g", "a").pendingRowsets(g).size == 1)
    eng.commitGroup(g)
    assert(rows(eng, "a") === Set(1L -> 10L, 2L -> 20L))
    assert(rows(eng, "b") === Set.empty[(Long, Long)]) // the delete landed
    assert(eng.manifest("g", "a").maxVersion == 1L)
    assert(eng.manifest("g", "a").pendingRowsets(g).isEmpty)
    // commit is idempotent
    eng.commitGroup(g)
    assert(rows(eng, "a") === Set(1L -> 10L, 2L -> 20L))
  }

  test("group commit stamps ONE visibility instant across tables: wall-clock " +
    "time travel at any asOf sees the whole group everywhere or nowhere") {
    val eng = mkEngine()
    eng.ingest("g", "a", kv(1L -> 10L))
    eng.ingest("g", "b", kv(1L -> 100L))
    val g = eng.newLoadGroup()
    eng.ingest("g", "a", kv(2L -> 20L), group = Some(g))
    Thread.sleep(5) // the stage instants differ; the commit instant must not
    eng.ingest("g", "b", kv(2L -> 200L), group = Some(g))
    eng.commitGroup(g)
    val aMs = eng.manifest("g", "a").allRowsets.maxBy(_.rowsetId).createdMs
    val bMs = eng.manifest("g", "b").allRowsets.maxBy(_.rowsetId).createdMs
    assert(aMs === bMs,
      "both tables' group rowsets must carry the same visibility instant")
    // just before the instant: neither table has the group; at it: both do
    assert(eng.snapshotAsOf("g", "a", aMs - 1).count() === 1L)
    assert(eng.snapshotAsOf("g", "b", aMs - 1).count() === 1L)
    assert(eng.snapshotAsOf("g", "a", aMs).count() === 2L)
    assert(eng.snapshotAsOf("g", "b", aMs).count() === 2L)
  }

  test("abortGroup reaps the staged rowsets' files and entries; a committed " +
    "group refuses to abort") {
    val eng = mkEngine()
    eng.ingest("g", "a", kv(1L -> 10L))
    val g = eng.newLoadGroup()
    val staged = eng.ingest("g", "a", kv(2L -> 20L), group = Some(g))
    val stagedDir = eng.tableRoot("g", "a").resolve(staged.relDir)
    assert(Files.exists(stagedDir))
    eng.abortGroup(g)
    assert(!Files.exists(stagedDir), "aborted stage must reap its files")
    assert(eng.manifest("g", "a").pendingRowsets(g).isEmpty)
    assert(rows(eng, "a") === Set(1L -> 10L))
    // and the table still loads normally afterwards (the version was never
    // taken, so the next load can reuse it)
    eng.ingest("g", "a", kv(3L -> 30L))
    assert(rows(eng, "a") === Set(1L -> 10L, 3L -> 30L))

    val g2 = eng.newLoadGroup()
    eng.ingest("g", "a", kv(4L -> 40L), group = Some(g2))
    eng.commitGroup(g2)
    assertThrows[IllegalArgumentException](eng.abortGroup(g2))
  }

  test("crash BEFORE the ledger commit: a fresh manifest load keeps the " +
    "stage invisible (and reapGroup cleans it); crash AFTER: the stage " +
    "self-heals to committed") {
    val root = Files.createTempDirectory("graft-grpspec-man-")
    def rs(id: Long, v: Long, g: Option[String]) =
      RowsetMeta(id, Version(v, v), s"r$id", 1L,
        createdMs = System.currentTimeMillis(), pendingGroup = g)
    // base rowset + a staged one under group "gX"
    val m = new TableManifest(root)
    m.publishAll(Seq(rs(1, 1, None), rs(2, 2, Some("gX"))))
    assert(m.maxVersion == 1L && m.visibleRowsets.map(_.rowsetId) == Seq(1L))

    // restart WITHOUT the ledger entry (crash before commit): still staged
    val uncommitted = new TableManifest(root)
    assert(uncommitted.maxVersion == 1L)
    assert(uncommitted.visibleRowsets.map(_.rowsetId) == Seq(1L))
    assert(uncommitted.pendingRowsets("gX").map(_.rowsetId) == Seq(2L))

    // restart WITH the group committed in the ledger (crash after the
    // rename, before the activation sweep): self-heals to visible
    val ledgerDir = Files.createTempDirectory("graft-grpspec-ledger-")
    new GroupLedger(ledgerDir).commit("gX")
    val healedLedger = new GroupLedger(ledgerDir) // reloads from disk
    assert(healedLedger.isCommitted("gX"))
    val healed = new TableManifest(root, () => healedLedger.committed)
    assert(healed.maxVersion == 2L)
    assert(healed.visibleRowsets.map(_.rowsetId).toSet == Set(1L, 2L))
    assert(healed.pendingRowsets("gX").isEmpty)
    assert(healed.captureConsistentVersions(1, 2).size == 2)
  }

  test("ledger: commit is durable and idempotent across reloads") {
    val dir = Files.createTempDirectory("graft-grpspec-ledger2-")
    val l1 = new GroupLedger(dir)
    l1.commit("a"); l1.commit("b"); l1.commit("a")
    val l2 = new GroupLedger(dir)
    assert(l2.committed === Set("a", "b"))
  }

  test("two loads staged into ONE table in one group get DISTINCT versions " +
    "at activation (stage order = merge-on-read order), even with a normal " +
    "load interleaved") {
    val eng = mkEngine()
    eng.ingest("g", "a", kv(1L -> 10L)) // v0
    val g = eng.newLoadGroup()
    eng.ingest("g", "a", kv(2L -> 20L, 5L -> 1L), group = Some(g))
    // a NORMAL load racing the open group takes the next real version
    eng.ingest("g", "a", kv(3L -> 30L)) // v1
    // second stage into the SAME table: upserts key 5 (last stage must win)
    eng.ingest("g", "a", kv(5L -> 2L), group = Some(g))
    eng.commitGroup(g)
    val m = eng.manifest("g", "a")
    val versions = m.visibleRowsets.map(_.version.start).sorted
    assert(versions == Seq(0L, 1L, 2L, 3L), s"collision-free versions, got $versions")
    assert(m.captureConsistentVersions(0L, m.maxVersion).size == 4)
    assert(rows(eng, "a") ===
      Set(1L -> 10L, 2L -> 20L, 3L -> 30L, 5L -> 2L),
      "second stage's upsert of key 5 must win (stage order preserved)")
  }

  test("abortGroup reaps stages from tables this engine instance never " +
    "touched (on-disk enumeration, not the manifest cache)") {
    val eng = mkEngine()
    val g = eng.newLoadGroup()
    val staged = eng.ingest("g", "a", kv(1L -> 1L), group = Some(g))
    val stagedDir = eng.tableRoot("g", "a").resolve(staged.relDir)
    // a FRESH engine over the same warehouse (cold manifest cache) must
    // still find and reap the stage
    val eng2 = new OlapEngine(spark, eng.warehouse)
    eng2.abortGroup(g)
    assert(!Files.exists(stagedDir), "restart abort must reap on-disk stages")
    assert(eng.warehouse.resolve("g").resolve("a").toFile.exists())
    assert(new OlapEngine(spark, eng.warehouse)
      .manifest("g", "a").pendingRowsets(g).isEmpty)
  }

  test("sweepGroups: retires fully-activated ledger ids, reaps abandoned " +
    "stages past grace, and protects groups with any young stage") {
    val eng = mkEngine()
    // committed group → its id retires once nothing stages it
    val g1 = eng.newLoadGroup()
    eng.ingest("g", "a", kv(1L -> 1L), group = Some(g1))
    eng.commitGroup(g1)
    // abandoned group (never committed)
    val g2 = eng.newLoadGroup()
    val orphan = eng.ingest("g", "b", kv(9L -> 9L), group = Some(g2))
    val orphanDir = eng.tableRoot("g", "b").resolve(orphan.relDir)
    // young grace: nothing reaps, id retires
    val (retired1, reaped1) = eng.sweepGroups(graceMs = 3600 * 1000L)
    assert(retired1 == 1, "g1 is fully activated — its ledger id must retire")
    assert(reaped1 == 0 && Files.exists(orphanDir),
      "a stage younger than grace must survive the sweep")
    // zero grace: the abandoned stage reaps
    val (_, reaped2) = eng.sweepGroups(graceMs = 0L)
    assert(reaped2 == 1 && !Files.exists(orphanDir))
    // a retired id must not resurrect or orphan anything on replay: a fresh
    // engine over the same warehouse serves the committed rows
    val eng2 = mkEngineAt(eng.warehouse)
    assert(eng2.scan("g", "a").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet === Set(1L -> 1L))
    assert(eng2.manifest("g", "a").pendingGroupIds.isEmpty)
    // and staging under a STILL-COMMITTED (unretired) id refuses loudly —
    // it would self-activate at the next load instead of staging
    val g3 = eng2.newLoadGroup()
    eng2.ingest("g", "b", kv(3L -> 3L), group = Some(g3))
    eng2.commitGroup(g3)
    assertThrows[IllegalArgumentException](
      eng2.ingest("g", "b", kv(4L -> 4L), group = Some(g3)))
  }

  test("crash between ledger commit and activation, then sweep BEFORE the " +
    "table's next lazy load: the sweep itself heals the stage (persisted), " +
    "so the retired id orphans nothing") {
    val eng = mkEngine()
    val g = eng.newLoadGroup()
    eng.ingest("g", "a", kv(1L -> 1L), group = Some(g))
    // simulate the crash: commit the ledger WITHOUT the activation sweep
    new GroupLedger(eng.warehouse).commit(g)
    // a fresh engine never touches g.a before sweeping
    val eng2 = new OlapEngine(spark, eng.warehouse)
    val (retired, _) = eng2.sweepGroups()
    assert(retired == 1)
    // the heal persisted: a third engine (ledger id now gone) still serves
    val eng3 = mkEngineAt(eng.warehouse)
    assert(eng3.scan("g", "a").count() === 1L)
    assert(eng3.manifest("g", "a").pendingGroupIds.isEmpty)
  }

  test("grouped loads refuse dynamic-partition tables (partition minting " +
    "and expiry are catalog edits that cannot stage)") {
    val eng = mkEngine()
    eng.createTable(TableDef(
      db = "g", name = "dyn",
      schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("d", TimestampType),
        ColumnSpec.value("v", LongType))),
      policy = PartitionPolicy.Range, partitionColumn = Some("d"),
      partitions = Seq(PartitionSpec("p0", Some("2020-02-01"), numBuckets = 2)),
      bucketColumn = Some("v"), numBuckets = 2,
      autoPartition = Some(AutoPartitionUnit.Month)))
    import spark.implicits._
    val df = Seq(("2020-01-05 00:00:00", 1L)).toDF("d", "v")
      .select(col("d").cast("timestamp").as("d"), col("v"))
    assertThrows[IllegalArgumentException](
      eng.ingest("g", "dyn", df, group = Some(eng.newLoadGroup())))
  }
}
