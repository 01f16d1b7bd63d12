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

/** GENERATED columns (Doris `col TYPE AS (expr)`): engine-computed at every
  * write from the other columns — supplied values are dropped and
  * recomputed (the definition is the truth), UPDATEs to source columns
  * refresh them, they can drive partition routing, and the expression
  * validates loudly at CREATE (refs, functions, determinism).
  */
class GeneratedColumnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val inSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", DoubleType)))

  private def rows(r: Range) = spark.createDataFrame(
    r.map(i => Row(i.toLong, i * 1.0)).asJava, inSchema)

  private def mkEngine(keysType: KeysType = KeysType.Duplicate): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-gen-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(keysType, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", DoubleType),
        ColumnSpec.value("vclass", StringType))),
      bucketColumn = Some("k"), numBuckets = 2,
      generatedColumns = Map(
        "vclass" -> "CASE WHEN v < 50 THEN 'low' ELSE 'high' END")))
    eng
  }

  test("ingest computes the column; a supplied value is dropped and recomputed") {
    val eng = mkEngine()
    eng.ingest("db", "t", rows(0 until 100), Some(Version(1, 1)))
    val got = eng.scan("db", "t").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(10L) == "low" && got(80L) == "high")
    // a forged value cannot be loaded — the engine recomputes
    val forged = spark.createDataFrame(
      Seq(Row(500L, 1.0, "FORGED")).asJava, StructType(inSchema.fields :+
        StructField("vclass", StringType)))
    eng.ingest("db", "t", forged, Some(Version(2, 2)))
    val r500 = eng.scan("db", "t").filter(col("k") === 500L).collect().head
    assert(r500.getString(2) == "low")
  }

  test("UPDATE on a source column refreshes the generated one; SET on it refuses") {
    val eng = mkEngine(KeysType.Unique)
    eng.ingest("db", "t", rows(0 until 100), Some(Version(1, 1)))
    eng.updateWhere("db", "t", Seq("v" -> "v + 60.0"), "k = 10")
    val r = eng.scan("db", "t").filter(col("k") === 10L).collect().head
    assert(r.getDouble(1) == 70.0 && r.getString(2) == "high",
      "generated column must recompute from the updated source")
    assertThrows[IllegalArgumentException](
      eng.updateWhere("db", "t", Seq("vclass" -> "'x'"), "true"))
  }

  test("a generated column can be the partition key (derive-and-route)") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-gen-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "p", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", DoubleType),
        ColumnSpec.value("half", StringType))),
      policy = PartitionPolicy.List, partitionColumn = Some("half"),
      partitions = Seq(
        PartitionSpec("pa", listValues = Seq("a"), numBuckets = 2),
        PartitionSpec("pb", listValues = Seq("b"), numBuckets = 2)),
      bucketColumn = Some("k"), numBuckets = 2,
      generatedColumns = Map("half" -> "CASE WHEN k < 50 THEN 'a' ELSE 'b' END")))
    eng.ingest("db", "p", rows(0 until 100), Some(Version(1, 1)))
    assert(eng.scanPartitions("db", "p", Seq("pa")).count() == 50L)
    assert(eng.scanPartitions("db", "p", Seq("pb")).count() == 50L)
  }

  test("CREATE validates loudly: unknown refs, gen-on-gen, nondeterminism, " +
    "DEFAULT/partial_update combos") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-gen-wh-"))
    eng.createDatabase("db")
    def base(gen: Map[String, String]) = TableDef(
      db = "db", name = "x", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("g1", DoubleType),
        ColumnSpec.value("g2", DoubleType))),
      bucketColumn = Some("k"), numBuckets = 1, generatedColumns = gen)
    assertThrows[IllegalArgumentException](
      eng.createTable(base(Map("g1" -> "nope + 1"))))
    assertThrows[IllegalArgumentException](
      eng.createTable(base(Map("g1" -> "k + 1", "g2" -> "g1 + 1"))))
    assertThrows[IllegalArgumentException](
      eng.createTable(base(Map("g1" -> "rand()"))))
    assertThrows[Exception](
      eng.createTable(base(Map("g1" -> "not_a_function(k)"))))
    assertThrows[IllegalArgumentException](base(Map("g1" -> "k + 1"))
      .copy(columnDefaults = Map("g1" -> "0")))
    assertThrows[IllegalArgumentException](TableDef(
      db = "db", name = "x", schema = TableSchema(KeysType.Unique, Seq(
        ColumnSpec.key("k", LongType), ColumnSpec.value("g1", DoubleType))),
      partialUpdate = true, generatedColumns = Map("g1" -> "k + 1")))
  }

  test("SQL face: AS (expr) claims, round-trips, INSERT omits generated columns") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-gen-wh-"))
    graft.sql.GraftSql.bind(spark, eng)
    def g(s: String) = graft.sql.GraftSql.sql(spark, s)
    g("CREATE DATABASE g_gen")
    g("""CREATE TABLE g_gen.t (
        |  k BIGINT, v DOUBLE,
        |  vclass VARCHAR(8) AS (CASE WHEN v < 50 THEN 'low' ELSE 'high' END)
        |) DUPLICATE KEY (k)
        |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
    val td = eng.catalog.getTable("g_gen", "t").get
    assert(td.generatedColumns ==
      Map("vclass" -> "CASE WHEN v < 50 THEN 'low' ELSE 'high' END"))
    val ddl = graft.sql.GraftSql.createTableSql(td)
    val rt = graft.sql.GraftSqlParser.parse(ddl).get
      .asInstanceOf[graft.sql.GraftStatement.CreateTable]
    assert(rt.generated == td.generatedColumns)
    // INSERT supplies only the non-generated width
    g("INSERT INTO g_gen.t VALUES (1, 10.0), (2, 90.0)")
    val got = eng.scan("g_gen", "t").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "low", 2L -> "high"))
  }

  test("renaming a SOURCE column follows into the stored expression; " +
    "dropping a source refuses; dropping the derived column retires its rule") {
    val eng = mkEngine()
    eng.ingest("db", "t", rows(0 until 10), Some(Version(1, 1)))
    eng.renameColumn("db", "t", "v", "amount")
    // loads keep working against the REWRITTEN expression
    eng.ingest("db", "t", spark.createDataFrame(
      Seq(Row(500L, 99.0)).asJava, StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("amount", DoubleType)))), Some(Version(2, 2)))
    val r = eng.scan("db", "t").filter(col("k") === 500L).collect().head
    assert(r.getString(2) == "high")
    assertThrows[IllegalArgumentException](eng.dropColumn("db", "t", "amount"))
    eng.dropColumn("db", "t", "vclass") // the derived column itself may go
    assert(eng.catalog.getTable("db", "t").get.generatedColumns.isEmpty)
  }

  test("a generated expression may reference the AUTO_INCREMENT column: " +
    "the id fills FIRST, so the derived value never computes from NULL") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-gen-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "ai", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("id", LongType),
        ColumnSpec.value("id_plus", LongType))),
      bucketColumn = Some("k"), numBuckets = 2,
      autoIncrementColumn = Some("id"),
      generatedColumns = Map("id_plus" -> "id + 1")))
    eng.ingest("db", "ai", spark.createDataFrame(
      (0 until 10).map(i => Row(i.toLong)).asJava,
      StructType(Seq(StructField("k", LongType, nullable = false)))),
      Some(Version(1, 1)))
    val bad = eng.scan("db", "ai")
      .filter(col("id_plus").isNull || col("id_plus") =!= col("id") + 1)
    assert(bad.isEmpty, "id_plus must derive from the FILLED id, never NULL")
  }

  test("the declaration survives a warehouse restart (persisted catalog)") {
    val wh = Files.createTempDirectory("graft-gen-wh-")
    val eng = new OlapEngine(spark, wh)
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", DoubleType),
        ColumnSpec.value("vclass", StringType))),
      bucketColumn = Some("k"), numBuckets = 2,
      generatedColumns = Map(
        "vclass" -> "CASE WHEN v < 50 THEN 'low' ELSE 'high' END")))
    val eng2 = new OlapEngine(spark, wh)
    eng2.ingest("db", "t", rows(0 until 10), Some(Version(1, 1)))
    assert(eng2.scan("db", "t").filter(col("vclass") === "low").count() == 10L)
  }
}
