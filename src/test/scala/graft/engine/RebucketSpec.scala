package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.model._

/** Online re-bucketing (the Doris schema-change job): content preserved
  * bit-for-bit through the layout rewrite, the new layout actually lands on
  * disk, point lookups prune with the new routing, and time travel to the
  * OLD layout is correct BECAUSE the prune rule stands down for
  * pre-rebucket rowsets (the layout floor).
  */
class RebucketSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkEngine(): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-rbspec-wh-"))
    eng.createDatabase("rb")
    eng
  }

  private def uniqueTable(eng: OlapEngine, buckets: Int): Unit =
    eng.createTable(TableDef(
      db = "rb", name = "t",
      schema = TableSchema(KeysType.Unique, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = buckets))

  private def kv(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("k", "v")
  }

  private def rows(eng: OlapEngine): Set[(Long, Long)] =
    eng.scan("rb", "t").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def bucketDirs(eng: OlapEngine, relDir: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val root = eng.tableRoot("rb", "t").resolve(relDir).resolve("__graft_part=p0")
    Files.list(root).iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("__graft_bucket=")).toSet
  }

  test("rebucket preserves content through upserts + deletes, lands the new " +
    "layout on disk, updates the catalog, and future loads route with it") {
    val eng = mkEngine()
    uniqueTable(eng, buckets = 2)
    eng.ingest("rb", "t", kv((0L until 40L).map(k => k -> (k * 10)): _*))
    eng.ingest("rb", "t", kv(3L -> 999L)) // upsert
    eng.ingestDeletes("rb", "t", kv(5L -> 0L).select("k"))
    val before = rows(eng)
    val meta = eng.rebucket("rb", "t", newBuckets = 7)
    assert(rows(eng) === before, "rebucket must not change content")
    assert(bucketDirs(eng, meta.relDir).size === 7, "new layout on disk")
    val td = eng.catalog.getTable("rb", "t").get
    assert(td.numBuckets === 7)
    assert(td.partitions.forall(_.numBuckets === 7))
    // a later load routes with the new layout and serves
    eng.ingest("rb", "t", kv(100L -> 1L))
    assert(rows(eng) === before + (100L -> 1L))
    // point lookup prunes with the NEW routing and is correct
    assert(eng.lookupByKey("rb", "t", "3").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set(3L -> 999L))
  }

  test("post-rebucket scans bucket-prune with the new layout; time-travel " +
    "scans of the OLD layout are never pruned (layout floor) and stay correct") {
    val eng = mkEngine()
    uniqueTable(eng, buckets = 2)
    eng.ingest("rb", "t", kv((0L until 40L).map(k => k -> k): _*))
    val headBefore = eng.manifest("rb", "t").maxVersion
    eng.rebucket("rb", "t", newBuckets = 5)
    // head scan with a key filter: the prune fires (plan carries the
    // injected __graft_bucket filter) and the answer is right
    val headQ = eng.scan("rb", "t").filter(col("k") === 7L)
    assert(headQ.queryExecution.executedPlan.toString.contains("__graft_bucket"),
      "head scan must bucket-prune under the new layout")
    assert(headQ.collect().map(_.getLong(1)).toSeq === Seq(7L))
    // time travel to the pre-rebucket version: OLD layout files. With 2 → 5
    // buckets most keys route differently, so a mis-applied new-layout prune
    // would silently drop rows; the layout floor must stand down instead
    val old = eng.snapshot("rb", "t", 0, headBefore).filter(col("k") === 7L)
    assert(!old.queryExecution.executedPlan.toString.contains("__graft_bucket IN") &&
      old.collect().map(_.getLong(1)).toSeq === Seq(7L),
      "old-layout scan must be unpruned and correct")
    // whole old snapshot intact
    assert(eng.snapshot("rb", "t", 0, headBefore).count() === 40L)
  }

  test("rebucket can move the bucket COLUMN (key-model tables: keys only) " +
    "and refuses random-bucketed tables and non-key columns") {
    val eng = mkEngine()
    eng.createTable(TableDef(
      db = "rb", name = "t",
      schema = TableSchema(KeysType.Unique, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.key("k2", LongType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = 2))
    import spark.implicits._
    eng.ingest("rb", "t",
      (0L until 20L).map(k => (k, k % 3, k)).toDF("k", "k2", "v"))
    val before = eng.scan("rb", "t").collect().map(_.toSeq).toSet
    eng.rebucket("rb", "t", newBuckets = 3, newBucketColumn = Some("k2"))
    assert(eng.scan("rb", "t").collect().map(_.toSeq).toSet === before)
    assert(eng.catalog.getTable("rb", "t").get.bucketColumn === Some("k2"))
    intercept[IllegalArgumentException] {
      eng.rebucket("rb", "t", 4, newBucketColumn = Some("v")) // non-key
    }
    eng.createTable(TableDef(
      db = "rb", name = "rnd",
      schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", LongType))),
      bucketType = BucketType.Random, bucketColumn = Some("k"), numBuckets = 2))
    eng.ingest("rb", "rnd", kv(1L -> 1L))
    intercept[IllegalArgumentException] { eng.rebucket("rb", "rnd", 4) }
  }
}
