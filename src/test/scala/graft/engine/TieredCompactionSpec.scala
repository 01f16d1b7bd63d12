package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.manifest.Version
import graft.model._

/** Tiered scheduled maintenance: delta tiers cumulative-merge (the base is
  * never read or rewritten), the base rewrites only under delete debt or
  * early-life fragmentation, and a healthy base+delta pair is left alone.
  * Answer-neutrality is asserted against pre-maintenance collects.
  */
class TieredCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", DoubleType)))

  private def mkEngine(model: KeysType = KeysType.Duplicate): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-tc-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(model, Seq(
        ColumnSpec.key("k", LongType), ColumnSpec.value("v", DoubleType))),
      bucketColumn = Some("k"), numBuckets = 2))
    eng
  }

  private def load(eng: OlapEngine, r: Range, v: Long): Unit =
    eng.ingest("db", "t", spark.createDataFrame(
      r.map(i => Row(i.toLong, i * 1.0)).asJava, schema), Some(Version(v, v)))

  test("delta tiers cumulative-merge; the base rowset is never rewritten") {
    val eng = mkEngine()
    load(eng, 0 until 1000, 1)            // the base
    (2 to 5).foreach(v => load(eng, (v * 1000) until (v * 1000 + 50), v.toLong))
    val before = eng.scan("db", "t").orderBy("k").collect().toSeq
    val baseId = eng.manifest("db", "t").visibleRowsets.maxBy(_.numRows).rowsetId
    val done = eng.runTieredCompaction()
    assert(done == Seq("db.t" -> "cumulative"), done.toString)
    val vis = eng.manifest("db", "t").visibleRowsets
    assert(vis.size == 2, "base + one merged delta")
    assert(vis.exists(_.rowsetId == baseId), "the base must survive untouched")
    assert(eng.scan("db", "t").orderBy("k").collect().toSeq == before)
    // healthy steady state: a second tick does nothing
    assert(eng.runTieredCompaction().isEmpty)
    // new deltas re-arm the cumulative tier, never the base
    (6 to 7).foreach(v => load(eng, (v * 1000) until (v * 1000 + 50), v.toLong))
    assert(eng.runTieredCompaction() == Seq("db.t" -> "cumulative"))
    assert(eng.manifest("db", "t").visibleRowsets.exists(_.rowsetId == baseId))
  }

  test("delete debt forces a full compact that clears it") {
    val eng = mkEngine()
    load(eng, 0 until 1000, 1)
    load(eng, 2000 until 2050, 2)
    eng.deleteWhere("db", "t", "k = 7", Some(Version(3, 3)))
    val done = eng.runTieredCompaction()
    assert(done == Seq("db.t" -> "full"))
    val vis = eng.manifest("db", "t").visibleRowsets
    assert(vis.size == 1 && !vis.head.isDeleteMarker)
    assert(eng.scan("db", "t").filter(org.apache.spark.sql
      .functions.col("k") === 7L).count() == 0L)
    assert(eng.countStar("db", "t") == 1049L)
    assert(eng.runTieredCompaction().isEmpty)
  }

  test("a fragmented base tier consolidates once, then rests") {
    val eng = mkEngine()
    load(eng, 0 until 50, 1)
    load(eng, 1000 until 1200, 2)   // the largest sits ABOVE an older fragment
    load(eng, 2000 until 2050, 3)
    assert(eng.runTieredCompaction() == Seq("db.t" -> "full"))
    assert(eng.manifest("db", "t").visibleRowsets.size == 1)
    assert(eng.runTieredCompaction().isEmpty)
  }

  test("Unique tombstone debt routes to full; the merged output is clean") {
    val eng = mkEngine(KeysType.Unique)
    load(eng, 0 until 100, 1)
    import spark.implicits._
    eng.ingestDeletes("db", "t", (0L until 100L by 10L).toDF("k"),
      Some(Version(2, 2)))
    assert(eng.runTieredCompaction() == Seq("db.t" -> "full"))
    assert(eng.scan("db", "t").count() == 90L)
    assert(eng.runTieredCompaction().isEmpty)
  }
}
