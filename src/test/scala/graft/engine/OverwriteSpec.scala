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

/** INSERT OVERWRITE ([[OlapEngine.overwrite]] + the SQL verb): atomic scope
  * replace as a mask+load pair under ONE load group. Pins the activation
  * order (the mask must never touch the incoming rows), partition scoping,
  * the out-of-scope refusal, all-or-nothing failure atomicity, and MVCC
  * see-through for pre-overwrite snapshots.
  */
class OverwriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("d", StringType),
    StructField("v", DoubleType)))

  private def mkEngine(keysType: KeysType = KeysType.Duplicate,
                       varcharMode: VarcharMode = VarcharMode.Ignore): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-ow-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(keysType, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.varchar("d", 8),
        ColumnSpec.value("v", DoubleType))),
      policy = PartitionPolicy.Range, partitionColumn = Some("d"),
      partitions = Seq(
        PartitionSpec("p0", upperExclusive = Some("m"), numBuckets = 2),
        PartitionSpec("p1", upperExclusive = None, numBuckets = 2)),
      bucketColumn = Some("k"), numBuckets = 2, varcharMode = varcharMode))
    eng
  }

  private def df(rows: Seq[Row]) = spark.createDataFrame(rows.asJava, schema)
  private def base = df((0 until 100).map(i =>
    Row(i.toLong, if (i % 2 == 0) "a" else "z", i * 1.0)))

  test("whole-table overwrite replaces content atomically; old snapshot survives") {
    val eng = mkEngine()
    eng.ingest("db", "t", base, Some(Version(1, 1)))
    val meta = eng.overwrite("db", "t",
      df(Seq(Row(777L, "a", 7.0), Row(888L, "z", 8.0))))
    assert(meta.numRows == 2L)
    val now = eng.scan("db", "t").collect().map(_.getLong(0)).sorted
    assert(now.toSeq == Seq(777L, 888L))
    // pre-overwrite snapshot still serves the old content (MVCC)
    assert(eng.snapshot("db", "t", 1, 1).count() == 100L)
    // mask + data activated as consecutive versions in stage order
    val m = eng.manifest("db", "t")
    val marker = m.visibleRowsets.find(_.isDeleteMarker).get
    assert(marker.version.start < meta.version.start,
      "the mask must activate BEFORE the data rowset")
  }

  test("partition-scoped overwrite: named scope replaced, siblings untouched, " +
    "directory mask used") {
    val eng = mkEngine()
    eng.ingest("db", "t", base, Some(Version(1, 1)))
    eng.overwrite("db", "t", df(Seq(Row(500L, "a", 50.0))), Seq("p0"))
    val got = eng.scan("db", "t").collect()
    val p0 = got.filter(_.getString(1) == "a")
    assert(p0.map(_.getLong(0)).toSeq == Seq(500L))
    assert(got.count(_.getString(1) == "z") == 50, "p1 must be untouched")
    val marker = eng.manifest("db", "t").visibleRowsets.find(_.isDeleteMarker).get
    assert(marker.deletePartition.contains("p0"),
      "partition overwrite must mask by DIRECTORY, not row predicate")
  }

  test("rows routed outside the named partitions refuse; nothing changes") {
    val eng = mkEngine()
    eng.ingest("db", "t", base, Some(Version(1, 1)))
    val before = eng.scan("db", "t").count()
    assertThrows[IllegalArgumentException](
      eng.overwrite("db", "t",
        df(Seq(Row(1L, "a", 1.0), Row(2L, "z", 2.0))), Seq("p0")))
    assert(eng.scan("db", "t").count() == before)
    assert(eng.manifest("db", "t").visibleRowsets.forall(!_.isDeleteMarker),
      "the staged mask must be reaped on failure — no half-applied group")
  }

  test("generated partition key: the guard routes on the RECOMPUTED value — " +
    "a forged in-scope value cannot smuggle rows outside the mask") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-ow-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "g", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("half", StringType),
        ColumnSpec.value("v", DoubleType))),
      policy = PartitionPolicy.List, partitionColumn = Some("half"),
      partitions = Seq(
        PartitionSpec("pa", listValues = Seq("a"), numBuckets = 2),
        PartitionSpec("pb", listValues = Seq("b"), numBuckets = 2)),
      bucketColumn = Some("k"), numBuckets = 2,
      generatedColumns = Map("half" -> "CASE WHEN k < 50 THEN 'a' ELSE 'b' END")))
    val gSchema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("half", StringType),
      StructField("v", DoubleType)))
    eng.ingest("db", "g", spark.createDataFrame((0 until 100).map(i =>
      Row(i.toLong, null, i * 1.0)).asJava, gSchema), Some(Version(1, 1)))
    // k=80 DERIVES 'b'; the forged 'a' must not pass the pa-scope guard
    assertThrows[IllegalArgumentException](
      eng.overwrite("db", "g",
        spark.createDataFrame(Seq(Row(80L, "a", 8.0)).asJava, gSchema),
        Seq("pa")))
    // the non-generated width works: the guard fills and routes
    val noGen = spark.createDataFrame(Seq(Row(7L, 7.0)).asJava,
      StructType(Seq(StructField("k", LongType, nullable = false),
        StructField("v", DoubleType))))
    eng.overwrite("db", "g", noGen, Seq("pa"))
    val got = eng.scan("db", "g").collect()
    assert(got.count(_.getString(1) == "a") == 1)
    assert(got.count(_.getString(1) == "b") == 50)
  }

  test("a failing load aborts the WHOLE group: no mask, no data, table unchanged") {
    val eng = mkEngine(varcharMode = VarcharMode.Strict)
    eng.ingest("db", "t", base, Some(Version(1, 1)))
    assertThrows[Exception](
      eng.overwrite("db", "t", df(Seq(Row(9L, "way-too-long-for-varchar8", 9.0)))))
    assert(eng.scan("db", "t").count() == 100L)
    assert(eng.manifest("db", "t").visibleRowsets.forall(!_.isDeleteMarker))
    assert(eng.manifest("db", "t").pendingGroupIds.isEmpty,
      "aborted overwrite must leave no pending stage behind")
  }

  test("Unique model: whole-table overwrite composes with merge-on-read") {
    val eng = mkEngine(keysType = KeysType.Unique)
    eng.ingest("db", "t", base, Some(Version(1, 1)))
    eng.overwrite("db", "t", df(Seq(Row(3L, "a", 333.0))))
    val got = eng.scan("db", "t").collect()
    assert(got.length == 1 && got.head.getLong(0) == 3L
      && got.head.getDouble(2) == 333.0)
  }

  test("SQL face: TABLE keyword + PARTITION clause parse; open group refuses") {
    val eng = mkEngine()
    eng.ingest("db", "t", base, Some(Version(1, 1)))
    graft.sql.GraftSql.bind(spark, eng)
    df(Seq(Row(600L, "a", 60.0))).createOrReplaceTempView("ow_repl")
    val out = graft.sql.GraftSql.sql(spark,
      "INSERT OVERWRITE TABLE db.t PARTITION (p0) SELECT * FROM ow_repl")
      .collect().head
    assert(out.getAs[Long]("num_rows") == 1L)
    assert(eng.scan("db", "t").filter(col("d") === "a").count() == 1L)
    graft.sql.GraftSql.sql(spark, "BEGIN LOAD GROUP")
    try assertThrows[IllegalArgumentException](
      graft.sql.GraftSql.sql(spark,
        "INSERT OVERWRITE db.t SELECT * FROM ow_repl"))
    finally graft.sql.GraftSql.sql(spark, "ABORT LOAD GROUP")
    // a non-engine table delegates to Spark's own INSERT OVERWRITE
    val d = intercept[Exception](graft.sql.GraftSql.sql(spark,
      "INSERT OVERWRITE nodb.nope SELECT 1"))
    assert(!d.isInstanceOf[graft.sql.GraftParseException])
  }
}
