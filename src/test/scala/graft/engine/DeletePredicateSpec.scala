package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.manifest.Version
import graft.model._

/** DELETE WHERE predicate deletes (the Doris/StarRocks delete-predicate
  * pattern): a delete is a metadata-only VERSION, not a data rewrite. Reads
  * mask matching rows of rowsets older than the delete version; rows loaded
  * after it survive; full compaction makes the delete physical.
  */
class DeletePredicateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val dupSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("cat", StringType),
    StructField("v", LongType)))

  private def dupEngine(): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-delw-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("cat", StringType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = 2))
    eng.ingest("db", "t", spark.createDataFrame(
      (0L until 10L).map(i => Row(i, if (i % 2 == 0) "a" else "b", i * 10)).asJava,
      dupSchema), Some(Version(1, 1)))
    eng
  }

  private def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("k").collect().map(_.getLong(0)).toSet

  test("delete masks older rowsets; later loads survive; MVCC sees through") {
    val eng = dupEngine()
    eng.deleteWhere("db", "t", "cat = 'a'", Some(Version(2, 2)))
    // masked immediately, no data rewritten
    assert(keys(eng.scan("db", "t")) == Set(1L, 3L, 5L, 7L, 9L))
    // a later load may re-add 'a' rows — the delete only covers older versions
    eng.ingest("db", "t", spark.createDataFrame(
      Seq(Row(100L, "a", 1L), Row(101L, "b", 2L)).asJava, dupSchema),
      Some(Version(3, 3)))
    assert(keys(eng.scan("db", "t")) == Set(1L, 3L, 5L, 7L, 9L, 100L, 101L))
    // snapshot BEFORE the delete version still sees everything
    assert(keys(eng.snapshot("db", "t", 1, 1)) == (0L until 10L).toSet)
    // NULL predicate result keeps the row (matches SQL DELETE semantics)
    eng.ingest("db", "t", spark.createDataFrame(
      Seq(Row(200L, null, 5L)).asJava, dupSchema), Some(Version(4, 4)))
    eng.deleteWhere("db", "t", "cat = 'zzz'", Some(Version(5, 5)))
    assert(keys(eng.scan("db", "t")).contains(200L))
  }

  test("full compaction makes the delete physical and retires the marker") {
    val eng = dupEngine()
    eng.deleteWhere("db", "t", "v >= 50", Some(Version(2, 2)))
    val before = eng.scan("db", "t").collect().toSet
    assert(eng.manifest("db", "t").visibleRowsets.exists(_.isDeleteMarker))
    // countStar must NOT use the manifest fast path while a delete is pending
    assert(eng.countStar("db", "t") == 5L)
    eng.compact("db", "t")
    eng.gc("db", "t")
    assert(!eng.manifest("db", "t").visibleRowsets.exists(_.isDeleteMarker))
    assert(eng.scan("db", "t").collect().toSet == before)
    // manifest fast path is exact again after compaction
    assert(eng.countStar("db", "t") == 5L)
  }

  test("cumulative compaction refuses to consume a delete marker") {
    val eng = dupEngine()
    eng.deleteWhere("db", "t", "cat = 'a'", Some(Version(2, 2)))
    eng.ingest("db", "t", spark.createDataFrame(
      Seq(Row(100L, "a", 1L)).asJava, dupSchema), Some(Version(3, 3)))
    eng.ingest("db", "t", spark.createDataFrame(
      Seq(Row(101L, "a", 2L)).asJava, dupSchema), Some(Version(4, 4)))
    // suffix [2,4] would retire the marker while base rows stay — refuse
    intercept[IllegalArgumentException] {
      eng.compactCumulative("db", "t", layerPoint = 2)
    }
    // suffix above the marker is fine, and the delete keeps masking the base
    eng.compactCumulative("db", "t", layerPoint = 3)
    assert(keys(eng.scan("db", "t")) == Set(1L, 3L, 5L, 7L, 9L, 100L, 101L))
  }

  test("backup/restore: consistent snapshot incl. delete markers and MVCC") {
    val eng = dupEngine()
    eng.deleteWhere("db", "t", "cat = 'a'", Some(Version(2, 2)))
    eng.ingest("db", "t", spark.createDataFrame(
      Seq(Row(100L, "a", 1L)).asJava, dupSchema), Some(Version(3, 3)))
    val expect = eng.scan("db", "t").collect().toSet
    val bk = Files.createTempDirectory("graft-backup-")
    val ids = eng.backup("db", "t", bk)
    assert(ids.size == 3) // two data rowsets + the delete marker

    // restore into a fresh table in a fresh warehouse
    val eng2 = new OlapEngine(spark, Files.createTempDirectory("graft-restore-wh-"))
    eng2.createDatabase("db")
    eng2.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("cat", StringType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = 2))
    eng2.restore("db", "t", bk)
    assert(eng2.scan("db", "t").collect().toSet == expect)
    // delete semantics and MVCC survive: pre-delete snapshot sees 'a' rows
    assert(keys(eng2.snapshot("db", "t", 1, 1)) == (0L until 10L).toSet)
    assert(keys(eng2.scan("db", "t")) == Set(1L, 3L, 5L, 7L, 9L, 100L))
    // restoring over data refuses
    intercept[IllegalArgumentException] { eng2.restore("db", "t", bk) }
  }

  test("Unique model: key-only predicates; resurrect via newer load") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-delw-uq-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "u", schema = TableSchema(KeysType.Unique, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("cat", StringType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = 2))
    eng.ingest("db", "u", spark.createDataFrame(
      (0L until 6L).map(i => Row(i, "a", i)).asJava, dupSchema), Some(Version(1, 1)))
    // value-column predicate rejected (it could resurrect older versions)
    intercept[IllegalArgumentException] {
      eng.deleteWhere("db", "u", "cat = 'a'")
    }
    // unknown column rejected
    intercept[IllegalArgumentException] {
      eng.deleteWhere("db", "u", "nope = 1")
    }
    eng.deleteWhere("db", "u", "k < 3", Some(Version(2, 2)))
    assert(keys(eng.scan("db", "u")) == Set(3L, 4L, 5L))
    // a NEWER upsert of a deleted key wins over the delete
    eng.ingest("db", "u", spark.createDataFrame(
      Seq(Row(1L, "a", 999L)).asJava, dupSchema), Some(Version(3, 3)))
    val got = eng.scan("db", "u").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 999L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }
}
