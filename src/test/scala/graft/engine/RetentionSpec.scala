package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.manifest.Version
import graft.model._

/** The stale-rowset retention window: superseded rowsets keep serving
  * wall-clock time travel inside the declared window (even ACROSS a
  * compaction that retired them), automated policies GC themselves past it,
  * and a time travel request beyond the persisted GC floor fails loudly —
  * never a silently wrong or empty snapshot. The reference defers physical
  * delete forever (src/tablet.rs:155-165); this is the bounded-disk form a
  * 100 TB table actually needs.
  */
class RetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false), StructField("v", LongType)))

  private def mkEngine(retention: Retention): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-ret-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = 2, retention = retention))
    eng.ingest("db", "t", spark.createDataFrame(
      (0L until 10L).map(i => org.apache.spark.sql.Row(i, i)).asJava, schema),
      Some(Version(1, 1)))
    eng.ingest("db", "t", spark.createDataFrame(
      (10L until 30L).map(i => org.apache.spark.sql.Row(i, i)).asJava, schema),
      Some(Version(2, 2)))
    eng
  }

  test("time travel works ACROSS a compaction inside the retention window") {
    val eng = mkEngine(Retention.KeepMs(24L * 3600 * 1000))
    val m = eng.manifest("db", "t")
    val t1 = m.visibleRowsets.map(_.createdMs).min
    eng.compact("db", "t") // retires both load rowsets; window keeps them
    assert(m.allRowsets.exists(_.state == graft.manifest.RowsetState.Stale),
      "window must retain the retired rowsets")
    // as-of the first load's publication: only its 10 rows, served from a
    // rowset that is STALE in the current manifest
    assert(eng.snapshotAsOf("db", "t", t1).count() == 10L)
    // latest snapshot unaffected
    assert(eng.scan("db", "t").count() == 30L)
  }

  test("KeepMs: gc past the window deletes, and older time travel fails loudly") {
    val eng = mkEngine(Retention.KeepMs(1000L))
    val m = eng.manifest("db", "t")
    val t1 = m.visibleRowsets.map(_.createdMs).min
    eng.compact("db", "t")
    // inside the window nothing is deleted (autoGc ran at compact time)
    assert(m.allRowsets.count(_.state == graft.manifest.RowsetState.Stale) == 2)
    assert(eng.snapshotAsOf("db", "t", t1).count() == 10L)
    // step the clock past the window: both retired rowsets go
    val deleted = eng.gc("db", "t", nowMs = System.currentTimeMillis() + 10000L)
    assert(deleted.size == 2)
    assert(m.gcFloorMs > 0)
    val ex = intercept[IllegalStateException](eng.snapshotAsOf("db", "t", t1))
    assert(ex.getMessage.contains("beyond the retention window"), ex.getMessage)
    // the floor is persisted: a fresh manifest instance still refuses
    val eng2 = new OlapEngine(spark, eng.warehouse)
    eng2.createDatabase("db")
    eng2.createTable(eng.catalog.getTable("db", "t").get)
    val ex2 = intercept[IllegalStateException](eng2.snapshotAsOf("db", "t", t1))
    assert(ex2.getMessage.contains("beyond the retention window"))
    // current reads still fine
    assert(eng.scan("db", "t").count() == 30L)
  }

  test("KeepVersions: history inside the last n versions survives gc") {
    val eng = mkEngine(Retention.KeepVersions(5))
    val m = eng.manifest("db", "t")
    eng.compact("db", "t") // compacted rowset covers [1,2]; retired: v1, v2
    // both retired rowsets are inside the last 5 versions -> kept
    assert(eng.gc("db", "t").isEmpty)
    assert(m.allRowsets.count(_.state == graft.manifest.RowsetState.Stale) == 2)
    // narrow policy: keep only the last version (v2) -> v1's rowset falls
    // out, v2's (version end == maxVersion) stays inside the window
    val td = eng.catalog.getTable("db", "t").get
    eng.catalog.alterTable(td.copy(retention = Retention.KeepVersions(1)))
    assert(eng.gc("db", "t").size == 1)
    assert(m.allRowsets.count(_.state == graft.manifest.RowsetState.Stale) == 1)
  }

  test("Forever never deletes; Manual deletes all stale on demand") {
    val engF = mkEngine(Retention.Forever)
    engF.compact("db", "t")
    assert(engF.gc("db", "t").isEmpty)
    assert(engF.manifest("db", "t").allRowsets
      .count(_.state == graft.manifest.RowsetState.Stale) == 2)

    val engM = mkEngine(Retention.Manual)
    engM.compact("db", "t")
    assert(engM.gc("db", "t").size == 2)
  }
}
