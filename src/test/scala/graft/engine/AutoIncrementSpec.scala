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

/** AUTO_INCREMENT column (Doris `BIGINT ... AUTO_INCREMENT`): NULL/absent
  * slots fill from a per-table counter persisted in the manifest —
  * reservation-before-use, dense within a load, unique and increasing
  * across loads and restarts, supplied values preserved. The assignment is
  * zipWithIndex over the null-slot rows: per-partition offsets, no shuffle.
  */
class AutoIncrementSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("k", LongType, nullable = false),
    StructField("v", DoubleType)))

  private def mkEngine(wh: java.nio.file.Path =
      Files.createTempDirectory("graft-ai-wh-")): OlapEngine = {
    val eng = new OlapEngine(spark, wh)
    if (eng.catalog.getTable("db", "t").isEmpty) {
      eng.createDatabase("db")
      eng.createTable(TableDef(
        db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
          ColumnSpec.key("k", LongType),
          ColumnSpec.value("id", LongType),
          ColumnSpec.value("v", DoubleType))),
        bucketColumn = Some("k"), numBuckets = 2,
        autoIncrementColumn = Some("id")))
    }
    eng
  }

  private def noIds(r: Range) = spark.createDataFrame(
    r.map(i => Row(null, i.toLong, i * 1.0)).asJava, schema)

  test("two id-less loads: dense 1..n, later load strictly above the earlier") {
    val eng = mkEngine()
    eng.ingest("db", "t", noIds(0 until 40), Some(Version(1, 1)))
    eng.ingest("db", "t", noIds(100 until 160), Some(Version(2, 2)))
    val rows = eng.scan("db", "t").select("id", "k").collect()
    val ids = rows.map(_.getLong(0)).sorted
    assert(ids.toSeq == (1L to 100L), "ids must be dense 1..n across loads")
    val load1Max = rows.filter(_.getLong(1) < 100).map(_.getLong(0)).max
    val load2Min = rows.filter(_.getLong(1) >= 100).map(_.getLong(0)).min
    assert(load1Max < load2Min, "blocks must not interleave across loads")
  }

  test("supplied values are preserved; only NULL slots fill") {
    val eng = mkEngine()
    val mixed = spark.createDataFrame(Seq(
      Row(5000L, 1L, 1.0), Row(null, 2L, 2.0), Row(6000L, 3L, 3.0),
      Row(null, 4L, 4.0)).asJava, schema)
    eng.ingest("db", "t", mixed, Some(Version(1, 1)))
    // scan returns DECLARED order: (k, id, v)
    val got = eng.scan("db", "t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 5000L && got(3L) == 6000L)
    assert(Set(got(2L), got(4L)) == Set(1L, 2L))
  }

  test("a load that omits the column entirely also fills") {
    val eng = mkEngine()
    val noCol = spark.createDataFrame(
      (0 until 10).map(i => Row(i.toLong, i * 1.0)).asJava,
      StructType(schema.fields.drop(1)))
    eng.ingest("db", "t", noCol, Some(Version(1, 1)))
    val ids = eng.scan("db", "t").select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (1L to 10L))
  }

  test("the counter persists: a fresh engine over the same warehouse never " +
    "re-issues an id") {
    val wh = Files.createTempDirectory("graft-ai-wh-")
    val eng = mkEngine(wh)
    eng.ingest("db", "t", noIds(0 until 25), Some(Version(1, 1)))
    val eng2 = new OlapEngine(spark, wh)
    eng2.ingest("db", "t", noIds(100 until 110), Some(Version(2, 2)))
    val ids = eng2.scan("db", "t").select("id").collect().map(_.getLong(0))
    assert(ids.length == 35 && ids.distinct.length == 35)
    assert(ids.min == 1L && ids.max == 35L)
  }

  test("shape refusals: non-BIGINT, partial_update, sequence column, unknown") {
    def td(base: TableDef): TableDef = base
    val k = ColumnSpec.key("k", LongType)
    assertThrows[IllegalArgumentException](td(TableDef("db", "x",
      TableSchema(KeysType.Duplicate, Seq(k, ColumnSpec.value("id", IntegerType))),
      autoIncrementColumn = Some("id"))))
    assertThrows[IllegalArgumentException](td(TableDef("db", "x",
      TableSchema(KeysType.Unique, Seq(k, ColumnSpec.value("id", LongType))),
      autoIncrementColumn = Some("id"), partialUpdate = true)))
    assertThrows[IllegalArgumentException](td(TableDef("db", "x",
      TableSchema(KeysType.Unique, Seq(k, ColumnSpec.value("id", LongType))),
      autoIncrementColumn = Some("id"), sequenceColumn = Some("id"))))
    assertThrows[IllegalArgumentException](td(TableDef("db", "x",
      TableSchema(KeysType.Duplicate, Seq(k)),
      autoIncrementColumn = Some("nope"))))
  }

  test("SQL face: AUTO_INCREMENT marker claims, round-trips, and fills " +
    "NULL slots through INSERT") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-ai-wh-"))
    graft.sql.GraftSql.bind(spark, eng)
    def g(s: String) = graft.sql.GraftSql.sql(spark, s)
    g("CREATE DATABASE g_ai")
    g("""CREATE TABLE g_ai.t (
        |  k BIGINT, id BIGINT AUTO_INCREMENT, v DOUBLE
        |) DUPLICATE KEY (k)
        |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
    val td = eng.catalog.getTable("g_ai", "t").get
    assert(td.autoIncrementColumn.contains("id"))
    val ddl = graft.sql.GraftSql.createTableSql(td)
    assert(ddl.contains("AUTO_INCREMENT"))
    // the rendered DDL parses back to the same declaration
    val rt = graft.sql.GraftSqlParser.parse(ddl).get
      .asInstanceOf[graft.sql.GraftStatement.CreateTable]
    assert(rt.autoIncrement.contains("id"))
    g("INSERT INTO g_ai.t VALUES (1, NULL, 1.5), (2, NULL, 2.5), (3, 30, 3.5)")
    val got = eng.scan("g_ai", "t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) == 30L)
    assert(Set(got(1L), got(2L)) == Set(1L, 2L))
  }
}
