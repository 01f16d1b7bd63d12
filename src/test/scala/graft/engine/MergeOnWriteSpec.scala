package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.manifest.{TableManifest, Version}
import graft.model._

/** Unique-model merge-on-write (Doris enable_unique_key_merge_on_write):
  * loads pre-merge their own rows per key at write time, rowsets carry the
  * keyUnique proof, and reads over provably key-disjoint covering sets
  * serve as a plain union — no merge aggregate. Every unprovable piece
  * (overlapping key bands, tombstones, foreign rowsets) falls back to
  * merge-on-read, which stays the semantic ground truth throughout.
  */
class MergeOnWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", DoubleType),
    StructField("tag", StringType)))

  private def mkEngine(mow: Boolean = true): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-mow-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Unique, Seq(
        ColumnSpec.key("k", LongType), ColumnSpec.value("v", DoubleType),
        ColumnSpec.value("tag", StringType))),
      bucketColumn = Some("k"), numBuckets = 2, mergeOnWrite = mow))
    eng
  }

  private def rows(r: Range, f: Long => Row): Seq[Row] = r.map(i => f(i.toLong))

  private def mergeAggs(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size

  test("each load pre-merges per key: the rowset physically holds one record per key") {
    val eng = mkEngine()
    // 100 keys, every 5th re-sent later in the SAME load with v+1000
    val base = rows(0 until 100, i => Row(i, i * 1.0, s"t$i"))
    val dups = rows(0 until 100, i => Row(i, i * 1.0 + 1000.0, s"u$i"))
      .zipWithIndex.collect { case (r, i) if i % 5 == 0 => r }
    eng.ingest("db", "t", spark.createDataFrame((base ++ dups).asJava, schema),
      Some(Version(1, 1)))
    val rs = eng.manifest("db", "t").visibleRowsets
    assert(rs.size == 1 && rs.head.keyUnique)
    assert(rs.head.numRows == 100L, "write-merge must collapse within-load dups")
    val raw = spark.read.parquet(
      eng.tableRoot("db", "t").resolve(rs.head.relDir).toString)
    assert(raw.count() == 100L)
    // later-in-load wins, and the winner's WHOLE record (both columns) wins
    val r5 = eng.scan("db", "t").filter(col("k") === 5L).collect().head
    assert(r5.getDouble(1) == 1005.0 && r5.getString(2) == "u5")
  }

  test("key-banded loads serve with NO merge aggregate; values equal merge-on-read") {
    val eng = mkEngine()
    eng.ingest("db", "t", spark.createDataFrame(
      rows(0 until 500, i => Row(i, i * 2.0, s"a$i")).asJava, schema),
      Some(Version(1, 1)))
    eng.ingest("db", "t", spark.createDataFrame(
      rows(500 until 1000, i => Row(i, i * 3.0, s"b$i")).asJava, schema),
      Some(Version(2, 2)))
    val snap = eng.scan("db", "t")
    assert(mergeAggs(snap) == 0,
      snap.queryExecution.optimizedPlan.toString)
    // ground truth: the same data in a merge-on-read table
    val ref = mkEngine(mow = false)
    ref.ingest("db", "t", spark.createDataFrame(
      rows(0 until 500, i => Row(i, i * 2.0, s"a$i")).asJava, schema),
      Some(Version(1, 1)))
    ref.ingest("db", "t", spark.createDataFrame(
      rows(500 until 1000, i => Row(i, i * 3.0, s"b$i")).asJava, schema),
      Some(Version(2, 2)))
    val refSnap = ref.scan("db", "t")
    assert(mergeAggs(refSnap) >= 1, "plain ingests must keep merge-on-read")
    assert(snap.orderBy("k").collect().toSeq ==
      refSnap.orderBy("k").collect().toSeq)
  }

  test("overlapping key bands fall back to merge-on-read and resolve upserts") {
    val eng = mkEngine()
    eng.ingest("db", "t", spark.createDataFrame(
      rows(0 until 100, i => Row(i, i * 1.0, "old")).asJava, schema),
      Some(Version(1, 1)))
    // upserts the same band: zone maps overlap, disjointness unprovable
    eng.ingest("db", "t", spark.createDataFrame(
      rows(0 until 100 by 2, i => Row(i, i * 1.0 + 7.0, "new")).asJava, schema),
      Some(Version(2, 2)))
    val snap = eng.scan("db", "t")
    assert(mergeAggs(snap) >= 1, "overlap must merge on read")
    assert(snap.count() == 100L)
    assert(snap.filter(col("tag") === "new").count() == 50L)
  }

  test("tombstones force merge-on-read; compaction restores the unmerged serve") {
    val eng = mkEngine()
    eng.ingest("db", "t", spark.createDataFrame(
      rows(0 until 100, i => Row(i, i * 1.0, "x")).asJava, schema),
      Some(Version(1, 1)))
    import spark.implicits._
    eng.ingestDeletes("db", "t",
      (0L until 100L by 10L).toDF("k"), Some(Version(2, 2)))
    val snap = eng.scan("db", "t")
    assert(mergeAggs(snap) >= 1, "a tombstone rowset must merge on read")
    assert(snap.count() == 90L)
    // full compaction makes the deletes physical and the output keyUnique
    eng.compact("db", "t")
    val post = eng.scan("db", "t")
    assert(mergeAggs(post) == 0,
      "a single compacted keyUnique rowset must serve unmerged")
    assert(post.count() == 90L)
    assert(eng.manifest("db", "t").visibleRowsets.head.keyUnique)
  }

  test("keyUnique survives a manifest reload; declarations are guarded") {
    val eng = mkEngine()
    eng.ingest("db", "t", spark.createDataFrame(
      rows(0 until 10, i => Row(i, 1.0, "x")).asJava, schema),
      Some(Version(1, 1)))
    val reloaded = new TableManifest(eng.tableRoot("db", "t"))
    assert(reloaded.visibleRowsets.head.keyUnique)
    // merge-on-write is Unique-only, and incompatible with partial update
    intercept[IllegalArgumentException] {
      TableDef(db = "db", name = "d", schema = TableSchema(KeysType.Duplicate,
        Seq(ColumnSpec.key("k", LongType), ColumnSpec.value("v", DoubleType))),
        bucketColumn = Some("k"), numBuckets = 1, mergeOnWrite = true)
    }
    intercept[IllegalArgumentException] {
      TableDef(db = "db", name = "p", schema = TableSchema(KeysType.Unique,
        Seq(ColumnSpec.key("k", LongType), ColumnSpec.value("v", DoubleType))),
        bucketColumn = Some("k"), numBuckets = 1, mergeOnWrite = true,
        partialUpdate = true)
    }
  }

  test("sequence column decides the within-load winner under merge-on-write") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-mow-wh-"))
    eng.createDatabase("db")
    val seqSchema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("s", LongType),
      StructField("v", DoubleType)))
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Unique, Seq(
        ColumnSpec.key("k", LongType), ColumnSpec.value("s", LongType),
        ColumnSpec.value("v", DoubleType))),
      bucketColumn = Some("k"), numBuckets = 1, mergeOnWrite = true,
      sequenceColumn = Some("s")))
    // the HIGHER sequence value arrives FIRST in the load — it must still win
    eng.ingest("db", "t", spark.createDataFrame(Seq(
      Row(1L, 9L, 99.0), Row(1L, 2L, 22.0)).asJava, seqSchema),
      Some(Version(1, 1)))
    assert(eng.manifest("db", "t").visibleRowsets.head.numRows == 1L)
    assert(eng.scan("db", "t").collect().head.getDouble(2) == 99.0)
  }
}
