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

/** Version-keyed result cache: hits serve the stored result bit-for-bit,
  * every commit class that changes answers moves the fingerprint, restarts
  * serve from disk, and the sweep reclaims exactly the unaddressable.
  */
class ResultCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType)))

  private def mkEngine(): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-rc-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType), ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = 2))
    eng.ingest("db", "t", spark.createDataFrame(
      (0L until 100L).map(i => Row(i, i)).asJava, schema), Some(Version(1, 1)))
    eng
  }

  private def agg(eng: OlapEngine) =
    eng.scan("db", "t").agg(count(lit(1)).as("n"), sum(col("v")).as("s"))

  test("second call is a hit and serves the identical result") {
    val eng = mkEngine()
    var computes = 0
    def run() = eng.results.cached("q", Seq(("db", "t")), { computes += 1; agg(eng) })
    val (r1, hit1) = run()
    val first = r1.collect().toSeq
    val (r2, hit2) = run()
    assert(!hit1 && hit2)
    assert(computes == 1)
    assert(r2.collect().toSeq == first)
    assert(first.head.getLong(0) == 100L && first.head.getLong(1) == 4950L)
  }

  test("an ingest moves the fingerprint: next call recomputes with new rows") {
    val eng = mkEngine()
    val (r1, _) = eng.results.cached("q", Seq(("db", "t")), agg(eng))
    assert(r1.collect().head.getLong(0) == 100L)
    eng.ingest("db", "t", spark.createDataFrame(
      Seq(Row(100L, 1000L)).asJava, schema), Some(Version(2, 2)))
    val (r2, hit) = eng.results.cached("q", Seq(("db", "t")), agg(eng))
    assert(!hit)
    assert(r2.collect().head.getLong(0) == 101L)
    assert(r2.collect().head.getLong(1) == 5950L)
  }

  test("schema evolution (RENAME COLUMN) moves the fingerprint") {
    val eng = mkEngine()
    val (_, h1) = eng.results.cached("q", Seq(("db", "t")), agg(eng))
    assert(!h1)
    eng.renameColumn("db", "t", "v", "amount")
    val (_, h2) = eng.results.cached("q", Seq(("db", "t")),
      eng.scan("db", "t").agg(count(lit(1)).as("n"), sum(col("amount")).as("s")))
    assert(!h2, "rename must invalidate even though no version moved")
  }

  test("compaction does NOT move the fingerprint (same answers, same entry)") {
    val eng = mkEngine()
    eng.ingest("db", "t", spark.createDataFrame(
      Seq(Row(100L, 1000L)).asJava, schema), Some(Version(2, 2)))
    val (r1, _) = eng.results.cached("q", Seq(("db", "t")), agg(eng))
    val first = r1.collect().toSeq
    eng.compact("db", "t")
    val (r2, hit) = eng.results.cached("q", Seq(("db", "t")), agg(eng))
    assert(hit, "compaction preserves answers — the cache must survive it")
    assert(r2.collect().toSeq == first)
  }

  test("oversized results are returned but not cached") {
    val eng = mkEngine()
    val small = new ResultCache(eng, maxRows = 10L)
    val (r1, h1) = small.cached("big", Seq(("db", "t")), eng.scan("db", "t"))
    assert(!h1 && r1.count() == 100L)
    val (_, h2) = small.cached("big", Seq(("db", "t")), eng.scan("db", "t"))
    assert(!h2, "a result over maxRows must not have been cached")
  }

  test("a fresh engine over the same warehouse serves persisted entries") {
    val eng = mkEngine()
    eng.results.cached("q", Seq(("db", "t")), agg(eng))
    val eng2 = new OlapEngine(spark, eng.warehouse)
    val (r, hit) = eng2.results.cached("q", Seq(("db", "t")), agg(eng2))
    assert(hit, "the cache is on-disk state — a restart must serve it")
    assert(r.collect().head.getLong(1) == 4950L)
  }

  test("sweep reclaims stale entries and keeps current ones") {
    val eng = mkEngine()
    eng.results.cached("q1", Seq(("db", "t")), agg(eng))
    eng.ingest("db", "t", spark.createDataFrame(
      Seq(Row(100L, 1000L)).asJava, schema), Some(Version(2, 2)))
    eng.results.cached("q1", Seq(("db", "t")), agg(eng)) // current entry
    val removed = eng.results.sweep()
    assert(removed == 1, s"exactly the pre-ingest entry is stale, got $removed")
    // the current entry still serves
    val (_, hit) = eng.results.cached("q1", Seq(("db", "t")), agg(eng))
    assert(hit)
    assert(eng.results.sweep() == 0)
  }
}
