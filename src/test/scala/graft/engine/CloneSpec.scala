package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.manifest.Version
import graft.model._

/** Shallow clone ([[OlapEngine.cloneTable]]): zero file copies, both-ways
  * divergence isolation, the GC safety contract on BOTH sides (a live
  * clone pins its borrowed rowsets against the source's gc; the clone's
  * own gc releases borrowed entries without deleting the source's files),
  * drop-unpins, and the time-travel (`upToVersion`) clone.
  */
class CloneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false), StructField("v", LongType)))

  private def rows(r: Range) =
    spark.createDataFrame(
      r.map(i => org.apache.spark.sql.Row(i.toLong, i.toLong)).asJava, schema)

  /** Duplicate table with two loads: v1 = [0,10), v2 = [10,30). */
  private def mkEngine(): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-clone-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = 2))
    eng.ingest("db", "t", rows(0 until 10), Some(Version(1, 1)))
    eng.ingest("db", "t", rows(10 until 30), Some(Version(2, 2)))
    eng
  }

  private def parquetFilesUnder(p: java.nio.file.Path): Long = {
    val s = Files.walk(p)
    try s.iterator().asScala.count(_.toString.endsWith(".parquet")).toLong
    finally s.close()
  }

  test("clone is metadata-only: zero parquet files under the clone root, " +
    "borrowed entries resolve into the source root, content matches") {
    val eng = mkEngine()
    eng.cloneTable("db", "t", "db", "c")
    assert(parquetFilesUnder(eng.tableRoot("db", "c")) === 0L,
      "a shallow clone must copy no data files")
    val srcRoot = eng.tableRoot("db", "t").toAbsolutePath.normalize.toString
    val borrowed = eng.manifest("db", "c").visibleRowsets.filter(_.numRows > 0)
    assert(borrowed.nonEmpty)
    assert(borrowed.forall(_.relDir.startsWith(srcRoot)),
      "borrowed rowsets must reference the source's directories")
    assert(eng.scan("db", "c").count() === 30L)
  }

  test("divergence is isolated both ways") {
    val eng = mkEngine()
    eng.cloneTable("db", "t", "db", "c")
    eng.ingest("db", "c", rows(100 until 105), Some(Version(3, 3)))
    eng.ingest("db", "t", rows(200 until 220), Some(Version(3, 3)))
    assert(eng.scan("db", "c").count() === 35L, "clone = snapshot + own load")
    assert(eng.scan("db", "t").count() === 50L, "source = all + own load")
  }

  test("source compaction + gc cannot break a live clone: borrowed rowsets " +
    "survive gc, the clone still serves the clone-time snapshot") {
    val eng = mkEngine()
    eng.cloneTable("db", "t", "db", "c")
    eng.compact("db", "t") // retires the two borrowed load rowsets
    val deleted = eng.gc("db", "t") // Manual retention: deletes all eligible
    assert(deleted.isEmpty, "gc must skip rowsets a live clone borrows")
    assert(eng.scan("db", "c").count() === 30L)
    assert(eng.scan("db", "t").count() === 30L)
  }

  test("dropping the clone unpins: the next source gc deletes the stale " +
    "borrowed rowsets for real") {
    val eng = mkEngine()
    eng.cloneTable("db", "t", "db", "c")
    eng.compact("db", "t")
    assert(eng.gc("db", "t").isEmpty)
    eng.catalog.dropTable("db", "c")
    val deleted = eng.gc("db", "t")
    assert(deleted.size === 2, "with the clone gone both stale loads must gc")
    assert(eng.scan("db", "t").count() === 30L)
  }

  test("clone-side compaction + gc releases borrowed entries WITHOUT " +
    "deleting the source's files") {
    val eng = mkEngine()
    eng.cloneTable("db", "t", "db", "c")
    eng.compact("db", "c") // clone materializes; borrowed entries go stale
    val dropped = eng.gc("db", "c")
    assert(dropped.size === 2, "the borrowed entries leave the clone manifest")
    // the files still belong to the source: both tables keep serving
    assert(eng.scan("db", "t").count() === 30L)
    assert(eng.scan("db", "c").count() === 30L)
    assert(parquetFilesUnder(eng.tableRoot("db", "c")) > 0L,
      "the clone's compaction output lives under its own root")
  }

  test("upToVersion clones the as-of snapshot, not the head") {
    val eng = mkEngine()
    eng.cloneTable("db", "t", "db", "c1", upToVersion = Some(1L))
    assert(eng.scan("db", "c1").count() === 10L)
  }
}
