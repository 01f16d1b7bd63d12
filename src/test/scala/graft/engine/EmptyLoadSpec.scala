package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.manifest.Version
import graft.model._

/** Empty loads and empty compactions are legitimate versions, not crashes
  * (found by the ClusterReps property test: a zero-row load wrote a
  * file-less rowset whose later scan failed schema inference). Doris
  * semantics: an empty load still bumps the version — the graph stays
  * hole-free and consumers see continuous versions; the read paths skip
  * file-less rowsets instead of trying to infer a schema from nothing.
  */
class EmptyLoadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false), StructField("v", LongType)))

  private def rows(r: Range) =
    spark.createDataFrame(
      r.map(i => org.apache.spark.sql.Row(i.toLong, i.toLong)).asJava, schema)

  private def mkEngine(keys: KeysType): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-empty-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(keys, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = 2))
    eng
  }

  test("a zero-row load publishes a valid empty version; reads skip it") {
    val eng = mkEngine(KeysType.Duplicate)
    eng.ingest("db", "t", rows(0 until 10), Some(Version(1, 1)))
    val meta = eng.ingest("db", "t", rows(0 until 0), Some(Version(2, 2)))
    assert(meta.numRows == 0)
    eng.ingest("db", "t", rows(10 until 15), Some(Version(3, 3)))
    // version graph continuous across the empty version; reads unaffected
    assert(!eng.hasVersionHoles("db", "t", 1, 3))
    assert(eng.scan("db", "t").count() == 15)
    assert(eng.snapshot("db", "t", 1, 2).count() == 10)
  }

  test("delete-everything then compact publishes an empty replacement rowset") {
    val eng = mkEngine(KeysType.Unique)
    eng.ingest("db", "t", rows(0 until 10), Some(Version(1, 1)))
    eng.ingestDeletes("db", "t",
      rows(0 until 10).select("k"), Some(Version(2, 2)))
    assert(eng.scan("db", "t").count() == 0)
    val meta = eng.compact("db", "t") // all keys tombstoned -> zero survivors
    assert(meta.numRows == 0)
    eng.gc("db", "t")
    assert(eng.scan("db", "t").count() == 0)
    // the table keeps working after the empty compaction
    eng.ingest("db", "t", rows(20 until 25))
    assert(eng.scan("db", "t").count() == 5)
  }
}
