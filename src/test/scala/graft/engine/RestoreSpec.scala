package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.manifest.Version
import graft.model._

/** RESTORE TO VERSION ([[OlapEngine.restoreToVersion]]): metadata-only
  * rollback — the restored head equals the as-of snapshot, no data files
  * move, the pre-restore head stays wall-clock time-travelable, ingest
  * continues on the restored head, and merge-on-read models roll back
  * their overwrites.
  */
class RestoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false), StructField("v", LongType)))

  private def rows(r: Range, f: Long => Long = identity) =
    spark.createDataFrame(
      r.map(i => org.apache.spark.sql.Row(i.toLong, f(i.toLong))).asJava, schema)

  private def mkEngine(keys: KeysType): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-restore-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(keys, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = 2))
    eng
  }

  private def parquetFilesUnder(p: java.nio.file.Path): Long = {
    val s = Files.walk(p)
    try s.iterator().asScala.count(_.toString.endsWith(".parquet")).toLong
    finally s.close()
  }

  test("restore is metadata-only and the head equals the as-of snapshot; " +
    "ingest continues on the restored head") {
    val eng = mkEngine(KeysType.Duplicate)
    eng.ingest("db", "t", rows(0 until 10), Some(Version(1, 1)))
    eng.ingest("db", "t", rows(10 until 30), Some(Version(2, 2)))
    val before = parquetFilesUnder(eng.tableRoot("db", "t"))
    eng.restoreToVersion("db", "t", 1)
    assert(parquetFilesUnder(eng.tableRoot("db", "t")) === before,
      "restore must not write or delete any data file")
    assert(eng.scan("db", "t").count() === 10L)
    // the bridge keeps the graph whole: the next load serves immediately
    eng.ingest("db", "t", rows(100 until 105), Some(Version(4, 4)))
    assert(eng.scan("db", "t").count() === 15L)
  }

  test("the pre-restore head stays wall-clock time-travelable until " +
    "retention drops it (a restore is an event, not an erasure)") {
    val eng = mkEngine(KeysType.Duplicate)
    eng.ingest("db", "t", rows(0 until 10), Some(Version(1, 1)))
    eng.ingest("db", "t", rows(10 until 30), Some(Version(2, 2)))
    Thread.sleep(5)
    val preRestore = System.currentTimeMillis()
    Thread.sleep(5)
    eng.restoreToVersion("db", "t", 1)
    assert(eng.scan("db", "t").count() === 10L)
    assert(eng.snapshotAsOf("db", "t", preRestore).count() === 30L,
      "the rolled-back load must still serve as-of its lifetime")
  }

  test("restore rolls back merge-on-read overwrites in a Unique table") {
    val eng = mkEngine(KeysType.Unique)
    eng.ingest("db", "t", rows(0 until 10), Some(Version(1, 1)))
    eng.ingest("db", "t", rows(0 until 10, _ + 1000), Some(Version(2, 2)))
    val overwritten = eng.scan("db", "t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(overwritten(3L) === 1003L, "v2 must win before the restore")
    eng.restoreToVersion("db", "t", 1)
    val restored = eng.scan("db", "t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(restored(3L) === 3L, "the restore must resurface v1's values")
    assert(restored.size === 10)
  }

  test("restore of a restore, and target validation") {
    val eng = mkEngine(KeysType.Duplicate)
    eng.ingest("db", "t", rows(0 until 10), Some(Version(1, 1)))
    eng.ingest("db", "t", rows(10 until 30), Some(Version(2, 2)))
    eng.restoreToVersion("db", "t", 1)          // head -> 3 (bridge)
    eng.ingest("db", "t", rows(50 until 70), Some(Version(4, 4)))
    eng.restoreToVersion("db", "t", 1)          // roll back the new load too
    assert(eng.scan("db", "t").count() === 10L)
    assertThrows[IllegalArgumentException](
      eng.restoreToVersion("db", "t", 99L))     // not before the head
  }
}
