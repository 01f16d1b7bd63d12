package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.manifest.{TableManifest, Version}
import graft.model._

/** Metadata-only per-partition row counts: the footer harvest attributes
  * each rowset's rows to the hive partition directories the engine itself
  * wrote, and `partitionRowCounts` folds them across the covering set —
  * exact for Duplicate tables with no delete markers, refused (None)
  * anywhere the fold could lie.
  */
class PartitionRowsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", DoubleType)))

  private def mkEngine(model: KeysType = KeysType.Duplicate): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-pr-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(model, Seq(
        ColumnSpec.key("k", LongType), ColumnSpec.value("v", DoubleType))),
      policy = PartitionPolicy.Range,
      partitionColumn = Some("k"),
      partitions = Seq(
        PartitionSpec("p0", upperExclusive = Some("500")),
        PartitionSpec("p1", upperExclusive = None)),
      bucketColumn = Some("k"), numBuckets = 2))
    eng
  }

  private def load(eng: OlapEngine, r: Range, v: Long): Unit =
    eng.ingest("db", "t", spark.createDataFrame(
      r.map(i => Row(i.toLong, i * 1.0)).asJava, schema), Some(Version(v, v)))

  test("counts fold exactly across loads and survive a manifest reload") {
    val eng = mkEngine()
    load(eng, 100 until 300, 1)   // 200 rows, all p0 ("100".."299" < "500")
    load(eng, 300 until 600, 2)   // "300".."499" → p0 (200), "500".."599" → p1 (100)
    assert(eng.partitionRowCounts("db", "t").contains(Map("p0" -> 400L, "p1" -> 100L)))
    val reloaded = new TableManifest(eng.tableRoot("db", "t"))
    assert(reloaded.visibleRowsets.map(_.partRows.values.sum).sum == 500L)
    // compaction re-harvests the attribution for the merged rowset
    eng.compact("db", "t")
    assert(eng.partitionRowCounts("db", "t").contains(Map("p0" -> 400L, "p1" -> 100L)))
  }

  test("delete markers and merge models refuse the fold") {
    val eng = mkEngine()
    load(eng, 100 until 300, 1)
    eng.deleteWhere("db", "t", "k = 150", Some(Version(2, 2)))
    assert(eng.partitionRowCounts("db", "t").isEmpty,
      "a delete marker masks an unknown count — must refuse")
    // full compaction makes the delete physical; the fold serves again
    eng.compact("db", "t")
    assert(eng.partitionRowCounts("db", "t").contains(Map("p0" -> 199L)))
    val uniq = mkEngine(KeysType.Unique)
    load(uniq, 100 until 300, 1)
    assert(uniq.partitionRowCounts("db", "t").isEmpty,
      "merge-on-read collapses rows — raw partition counts would overstate")
  }
}
