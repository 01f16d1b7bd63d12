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

/** EXPORT ([[OlapEngine.exportTable]] + the SQL verb): merged-snapshot
  * egress to external parquet/csv/json — tombstones resolved, partition
  * scope pruned, existing destinations refused. The semantic pin: export
  * writes what a READER sees, never raw rowsets (that is [[OlapEngine
  * .backup]]'s job).
  */
class ExportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("d", StringType),
    StructField("v", DoubleType)))

  private def mkEngine(keysType: KeysType = KeysType.Duplicate): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-exp-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(keysType, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("d", StringType),
        ColumnSpec.value("v", DoubleType))),
      policy = PartitionPolicy.List, partitionColumn = Some("d"),
      partitions = Seq(
        PartitionSpec("pa", listValues = Seq("a"), numBuckets = 2),
        PartitionSpec("pb", listValues = Seq("b"), numBuckets = 2)),
      bucketColumn = Some("k"), numBuckets = 2))
    eng.ingest("db", "t", spark.createDataFrame((0 until 100).map(i =>
      Row(i.toLong, if (i % 2 == 0) "a" else "b", i * 1.0)).asJava, schema),
      Some(Version(1, 1)))
    eng
  }

  private def dest() = {
    val p = Files.createTempDirectory("graft-exp-out-").resolve("out")
    p
  }

  test("parquet export equals the scan; existing destination refuses") {
    val eng = mkEngine()
    val out = dest()
    val n = eng.exportTable("db", "t", out)
    val parts = Files.list(out).iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet"))
    assert(n == parts, "the reported count must be DATA files only " +
      "(no _SUCCESS, no .crc checksum sidecars)")
    val back = spark.read.parquet(out.toString)
    assert(back.count() == 100L)
    assert(back.agg(sum(col("v"))).head.getDouble(0) ==
      eng.scan("db", "t").agg(sum(col("v"))).head.getDouble(0))
    assertThrows[IllegalArgumentException](eng.exportTable("db", "t", out))
  }

  test("export writes the MERGED view: tombstoned keys are absent") {
    val eng = mkEngine(KeysType.Unique)
    eng.ingestDeletes("db", "t", spark.createDataFrame(
      (0 until 100 by 10).map(i => Row(i.toLong, if (i % 2 == 0) "a" else "b",
        null)).asJava, schema).select("k", "d"), Some(Version(2, 2)))
    val out = dest()
    eng.exportTable("db", "t", out)
    val back = spark.read.parquet(out.toString)
    assert(back.count() == 90L, "a raw-rowset export would leak tombstones")
    assert(back.columns.toSet == Set("k", "d", "v"),
      "internal columns must not leak into an export")
  }

  test("partition-scoped export prunes; csv format lands with header") {
    val eng = mkEngine()
    val out = dest()
    eng.exportTable("db", "t", out, format = "csv", partitions = Seq("pa"))
    val back = spark.read.option("header", "true").csv(out.toString)
    assert(back.count() == 50L)
    assert(back.columns.toSet == Set("k", "d", "v"))
  }

  test("SQL face: PARTITION + FORMAT clauses; bad format refuses") {
    val eng = mkEngine()
    graft.sql.GraftSql.bind(spark, eng)
    val out = dest()
    val row = graft.sql.GraftSql.sql(spark,
      s"EXPORT TABLE db.t PARTITION (pb) TO '$out' FORMAT json").collect().head
    assert(row.getString(2).contains("json"))
    assert(spark.read.json(out.toString).count() == 50L)
    assertThrows[IllegalArgumentException](
      eng.exportTable("db", "t", dest(), format = "orcish"))
  }
}
