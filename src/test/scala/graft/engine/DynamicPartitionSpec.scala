package graft.engine

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.model._

/** Dynamic partitioning (Doris `dynamic_partition`, lazily at load): a Range
  * table with an [[AutoPartitionUnit]] extends its own ladder to cover each
  * load's max key; without it, out-of-range keys stay loudly unroutable.
  */
class DynamicPartitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("k", LongType, nullable = false)))

  private def rows(days: Seq[String]) =
    spark.createDataFrame(
      days.zipWithIndex.map { case (d, i) =>
        org.apache.spark.sql.Row(Timestamp.valueOf(s"$d 12:00:00"), i.toLong)
      }.asJava, schema)

  private def mkEngine(auto: Option[AutoPartitionUnit],
                       bound: String = "2024-01-03"): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-dynp-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("ts", TimestampType),
        ColumnSpec.value("k", LongType))),
      policy = PartitionPolicy.Range,
      partitionColumn = Some("ts"),
      partitions = Seq(PartitionSpec("p0", Some(bound), numBuckets = 2)),
      bucketColumn = Some("k"), numBuckets = 2,
      autoPartition = auto))
    eng
  }

  test("day unit: the ladder extends to cover the load; rows route per day") {
    val eng = mkEngine(Some(AutoPartitionUnit.Day))
    eng.ingest("db", "t",
      rows(Seq("2024-01-02", "2024-01-03", "2024-01-05", "2024-01-05")))
    val td = eng.catalog.getTable("db", "t").get
    assert(td.partitions.map(_.name) ===
      Seq("p0", "pa_20240103", "pa_20240104", "pa_20240105"),
      td.partitions.mkString(", "))
    assert(td.partitions.flatMap(_.upperExclusive) ===
      Seq("2024-01-03", "2024-01-04", "2024-01-05", "2024-01-06"))
    assert(eng.scan("db", "t").count() == 4)
    // directory-level routing: each day landed in its own partition
    assert(eng.scanPartitions("db", "t", Seq("pa_20240105")).count() == 2)
    assert(eng.scanPartitions("db", "t", Seq("p0")).count() == 1)
    // a later in-range load creates nothing new
    eng.ingest("db", "t", rows(Seq("2024-01-04")))
    assert(eng.catalog.getTable("db", "t").get.partitions.size == 4)
  }

  test("month unit steps by calendar month (bounds must be month-aligned)") {
    val eng = mkEngine(Some(AutoPartitionUnit.Month), bound = "2024-01-01")
    eng.ingest("db", "t", rows(Seq("2024-03-10")))
    val bounds = eng.catalog.getTable("db", "t").get.partitions.flatMap(_.upperExclusive)
    assert(bounds === Seq("2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01"))
  }

  test("month unit refuses a mid-month bound at create (pa_ names describe " +
    "calendar months; plusMonths from day-31 would drift through Feb)") {
    val e = intercept[IllegalArgumentException](
      mkEngine(Some(AutoPartitionUnit.Month), bound = "2024-01-03"))
    assert(e.getMessage.contains("month-aligned"))
  }

  test("without autoPartition, an out-of-range key still fails loudly") {
    val eng = mkEngine(None)
    val e = intercept[Exception](eng.ingest("db", "t", rows(Seq("2024-02-01"))))
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" <- ")
    assert(msgs.contains("no partition for key"), msgs)
  }

  test("createTable refuses autoPartition on MAXVALUE/unparseable/non-Range shapes") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-dynp2-wh-"))
    eng.createDatabase("db")
    def td(parts: Seq[PartitionSpec], policy: PartitionPolicy = PartitionPolicy.Range) =
      TableDef(db = "db", name = "bad", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("ts", TimestampType), ColumnSpec.value("k", LongType))),
        policy = policy, partitionColumn = Some("ts"), partitions = parts,
        bucketColumn = Some("k"), numBuckets = 2,
        autoPartition = Some(AutoPartitionUnit.Day))
    intercept[IllegalArgumentException](
      eng.createTable(td(Seq(PartitionSpec("pmax", None))))) // MAXVALUE
    intercept[IllegalArgumentException](
      eng.createTable(td(Seq(PartitionSpec("p0", Some("whenever")))))) // bound
    intercept[IllegalArgumentException](
      eng.createTable(td(Seq(PartitionSpec("p0")), PartitionPolicy.Unpartitioned)))
  }

  test("far-future corrupt key is rejected instead of minting partitions — " +
    "and the rejection leaves the ladder completely untouched") {
    val eng = mkEngine(Some(AutoPartitionUnit.Day))
    val e = intercept[Exception](eng.ingest("db", "t", rows(Seq("2999-01-01"))))
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" <- ")
    assert(msgs.contains("> max"), msgs)
    assert(eng.catalog.getTable("db", "t").get.partitions.map(_.name) === Seq("p0"))
  }

  test("expiry (autoExpireKeep): the load extends then retires old rungs as " +
    "delete-predicate VERSIONS — latest scan masks them, time travel at the " +
    "load version still sees every row, no files are deleted") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-dynp4-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("ts", TimestampType),
        ColumnSpec.value("k", LongType))),
      policy = PartitionPolicy.Range,
      partitionColumn = Some("ts"),
      partitions = Seq(PartitionSpec("p0", Some("2024-01-03"), numBuckets = 2)),
      bucketColumn = Some("k"), numBuckets = 2,
      autoPartition = Some(AutoPartitionUnit.Day),
      autoExpireKeep = Some(2)))
    // rows land in p0 (01-02), pa_20240103 (01-03), pa_20240105 (01-05 x2);
    // ladder after the load: p0, pa_20240103, pa_20240104, pa_20240105 —
    // keep 2 retires p0 and pa_20240103
    eng.ingest("db", "t",
      rows(Seq("2024-01-02", "2024-01-03", "2024-01-05", "2024-01-05")))
    val td = eng.catalog.getTable("db", "t").get
    assert(td.partitions.map(_.name) === Seq("pa_20240104", "pa_20240105"))
    assert(td.droppedPartitions.map(_.name) === Seq("p0", "pa_20240103"))
    // latest scan: only the surviving partitions' rows
    assert(eng.scan("db", "t").count() === 2)
    // the drops are delete-predicate versions, NOT file deletion: the load
    // version's snapshot still serves all four rows
    assert(eng.snapshot("db", "t", 0, 0).count() === 4)
    assert(eng.manifest("db", "t").visibleRowsets.count(_.isDeleteMarker) === 2)
    // a load into an expired range now fails loudly (dropped = unroutable)
    val e = intercept[Exception](eng.ingest("db", "t", rows(Seq("2024-01-02"))))
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" <- ")
    assert(msgs.contains("no partition for key"), msgs)
  }

  test("a failed load mints NOTHING: strict-varchar reject after an " +
    "out-of-range key leaves no partitions, no versions, no rowsets") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-dynp3-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("ts", TimestampType),
        ColumnSpec.varchar("s", 4))),
      policy = PartitionPolicy.Range,
      partitionColumn = Some("ts"),
      partitions = Seq(PartitionSpec("p0", Some("2024-01-03"), numBuckets = 2)),
      bucketColumn = Some("s"), numBuckets = 2,
      autoPartition = Some(AutoPartitionUnit.Day),
      varcharMode = VarcharMode.Strict))
    val schema2 = StructType(Seq(
      StructField("ts", TimestampType, nullable = false),
      StructField("s", StringType)))
    val bad = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(Timestamp.valueOf("2024-01-06 12:00:00"),
        "waytoolong")).asJava, schema2)
    intercept[Exception](eng.ingest("db", "t", bad))
    // the whole load is invisible: the out-of-range key did NOT leave its
    // auto-minted rungs behind (the round-7 advice hazard)
    assert(eng.catalog.getTable("db", "t").get.partitions.map(_.name) === Seq("p0"))
    assert(eng.manifest("db", "t").maxVersion === -1L, "no version published")
    // and a later good load still self-extends normally
    eng.ingest("db", "t", spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(Timestamp.valueOf("2024-01-04 08:00:00"), "ok")).asJava,
      schema2))
    assert(eng.catalog.getTable("db", "t").get.partitions.map(_.name) ===
      Seq("p0", "pa_20240103", "pa_20240104"))
    assert(eng.scan("db", "t").count() === 1)
  }

  test("expired-partition late-load policy: loud by default; opt-in " +
    "expiredToDeadLetter quarantines late rows into the companion table " +
    "without touching main-table serves") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-dynp4-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("ts", TimestampType),
        ColumnSpec.value("k", LongType))),
      policy = PartitionPolicy.Range,
      partitionColumn = Some("ts"),
      partitions = Seq(PartitionSpec("p0", Some("2024-01-03"), numBuckets = 2)),
      bucketColumn = Some("k"), numBuckets = 2,
      autoPartition = Some(AutoPartitionUnit.Day),
      autoExpireKeep = Some(2),
      expiredToDeadLetter = true))
    // extend + expire: keep 2 retires p0 and pa_20240103
    eng.ingest("db", "t",
      rows(Seq("2024-01-02", "2024-01-03", "2024-01-05", "2024-01-05")))
    assert(eng.catalog.getTable("db", "t").get.droppedPartitions.map(_.name) ===
      Seq("p0", "pa_20240103"))
    assert(eng.scan("db", "t").count() === 2)
    // a MIXED late load: the expired-range row is quarantined, the live
    // row publishes normally — no exception, no partial loss
    eng.ingest("db", "t", rows(Seq("2024-01-02", "2024-01-05")))
    assert(eng.scan("db", "t").count() === 3,
      "the live row of the mixed load must serve")
    val dl = eng.deadLetterScan("db", "t")
    assert(dl.count() === 1)
    assert(dl.head().getTimestamp(0).toString.startsWith("2024-01-02"))
    // quarantined rows never reach main-table serves
    assert(eng.scan("db", "t")
      .filter(org.apache.spark.sql.functions.col("ts") < "2024-01-04")
      .count() === 0)
    // a table WITHOUT the opt-in has no dead letter to scan
    val engLoud = new OlapEngine(spark, Files.createTempDirectory("graft-dynp5-wh-"))
    engLoud.createDatabase("db")
    engLoud.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("ts", TimestampType),
        ColumnSpec.value("k", LongType))),
      policy = PartitionPolicy.Range,
      partitionColumn = Some("ts"),
      partitions = Seq(PartitionSpec("p0", Some("2024-01-03"), numBuckets = 2)),
      bucketColumn = Some("k"), numBuckets = 2,
      autoPartition = Some(AutoPartitionUnit.Day),
      autoExpireKeep = Some(2)))
    val e = intercept[IllegalArgumentException](engLoud.deadLetterScan("db", "t"))
    assert(e.getMessage.contains("expiredToDeadLetter"))
  }
}
