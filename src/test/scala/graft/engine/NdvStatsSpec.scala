package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.manifest.{NdvSketch, TableManifest, Version}
import graft.model._

/** Fold-able NDV statistics: per-rowset HLL sketch sidecars built at every
  * data write, unioned driver-side into table-level approximate distinct
  * counts. Unknown beats wrong: any unprovable piece (markers, missing
  * sidecars, merge-model value columns) refuses rather than estimates.
  */
class NdvStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("g", LongType),
    StructField("s", StringType)))

  private def mkEngine(model: KeysType = KeysType.Duplicate,
      declare: Boolean = true): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-ndv-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(model, Seq(
        ColumnSpec.key("k", LongType), ColumnSpec.value("g", LongType),
        ColumnSpec.value("s", StringType))),
      bucketColumn = Some("k"), numBuckets = 2,
      ndvStatsColumns = if (declare) Seq("k", "g", "s") else Nil))
    eng
  }

  private def load(eng: OlapEngine, r: Range, v: Long): Unit =
    eng.ingest("db", "t", spark.createDataFrame(
      r.map(i => Row(i.toLong, (i % 50).toLong, s"s${i % 200}")).asJava,
      schema), Some(Version(v, v)))

  test("sketches build per load, survive reloads, and union to accurate NDVs") {
    val eng = mkEngine()
    load(eng, 0 until 3000, 1)
    load(eng, 2000 until 6000, 2) // overlapping distincts must not double
    val rs = eng.manifest("db", "t").visibleRowsets
    assert(rs.forall(_.ndvCols == Seq("k", "g", "s")))
    val root = eng.tableRoot("db", "t")
    assert(Files.isRegularFile(root.resolve(rs.head.relDir).resolve("_ndv_k.gndv")))
    assert(new TableManifest(root).visibleRowsets
      .forall(_.ndvCols == Seq("k", "g", "s")))
    val ndvK = eng.approxNdv("db", "t", "k").get
    val ndvG = eng.approxNdv("db", "t", "g").get
    val ndvS = eng.approxNdv("db", "t", "s").get
    assert(math.abs(ndvK - 6000) <= 300, s"ndv(k)=$ndvK vs 6000")
    assert(math.abs(ndvG - 50) <= 3, s"ndv(g)=$ndvG vs 50")
    assert(math.abs(ndvS - 200) <= 10, s"ndv(s)=$ndvS vs 200")
    // SHOW STATS surfaces the fold + coverage
    val stats = eng.describeStats("db", "t").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats("k").getLong(10) == 2L)
    assert(math.abs(stats("k").getDouble(9) - ndvK) < 1e-9)
  }

  test("refusals: undeclared, delete markers, merge-model value columns") {
    val none = mkEngine(declare = false)
    load(none, 0 until 100, 1)
    assert(none.approxNdv("db", "t", "k").isEmpty)
    val eng = mkEngine()
    load(eng, 0 until 100, 1)
    eng.deleteWhere("db", "t", "k = 5", Some(Version(2, 2)))
    assert(eng.approxNdv("db", "t", "k").isEmpty,
      "a delete marker hides an unknown number of distincts")
    // compaction clears the marker and re-sketches the merged rowset
    eng.compact("db", "t")
    val ndv = eng.approxNdv("db", "t", "k").get
    assert(math.abs(ndv - 99) <= 5)
    // Unique: key columns serve (raw keys ≡ merged keys), value columns
    // refuse (upserts double-count raw values)
    val uniq = mkEngine(KeysType.Unique)
    load(uniq, 0 until 100, 1)
    load(uniq, 0 until 50, 2) // upserts
    assert(uniq.approxNdv("db", "t", "k").isDefined)
    assert(uniq.approxNdv("db", "t", "g").isEmpty)
    import spark.implicits._
    uniq.ingestDeletes("db", "t", Seq(7L).toDF("k"), Some(Version(3, 3)))
    assert(uniq.approxNdv("db", "t", "k").isEmpty,
      "a tombstoned key would still count — must refuse")
  }
}
