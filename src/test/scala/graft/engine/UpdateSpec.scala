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

/** UPDATE on the Unique model ([[OlapEngine.updateWhere]] + the SQL verb):
  * read-modify-write over the merged snapshot, written back as one upsert
  * rowset at snapshot+1. Standard UPDATE semantics are pinned hard — every
  * SET right-hand side evaluates against the OLD row (so `SET a = b, b = a`
  * swaps), key/sequence columns refuse, and a concurrent writer makes the
  * publish fail loudly instead of losing the update.
  */
class UpdateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("a", DoubleType),
    StructField("b", DoubleType),
    StructField("tag", StringType)))

  private def mkEngine(seq: Option[String] = None,
                       keysType: KeysType = KeysType.Unique): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-upd-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(keysType, Seq(
        ColumnSpec.key("k", LongType), ColumnSpec.value("a", DoubleType),
        ColumnSpec.value("b", DoubleType), ColumnSpec.value("tag", StringType))),
      bucketColumn = Some("k"), numBuckets = 2, sequenceColumn = seq))
    eng
  }

  private def load(eng: OlapEngine, n: Int, v: Long): Unit =
    eng.ingest("db", "t", spark.createDataFrame(
      (0 until n).map(i => Row(i.toLong, i * 1.0, i * 10.0, s"t$i")).asJava,
      schema), Some(Version(v, v)))

  test("basic update: matching rows change, others persist, one new version") {
    val eng = mkEngine()
    load(eng, 100, 1)
    val meta = eng.updateWhere("db", "t",
      Seq("a" -> "a + 1000.0", "tag" -> "upper(tag)"), "k % 10 = 0")
    assert(meta.numRows == 10L)
    assert(meta.version == Version(2, 2))
    val got = eng.scan("db", "t").collect().map(r =>
      r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getString(3)))).toMap
    assert(got.size == 100)
    assert(got(20L) == ((1020.0, 200.0, "T20")))
    assert(got(21L) == ((21.0, 210.0, "t21")))
  }

  test("every SET RHS sees the OLD row: SET a = b, b = a swaps") {
    val eng = mkEngine()
    load(eng, 10, 1)
    eng.updateWhere("db", "t", Seq("a" -> "b", "b" -> "a"), "k = 3")
    val r = eng.scan("db", "t").filter(col("k") === 3L).collect().head
    assert(r.getDouble(1) == 30.0 && r.getDouble(2) == 3.0,
      "RHS must evaluate against the old row, not earlier SETs")
  }

  test("predicate may reference VALUE columns (resolved on the merged view)") {
    val eng = mkEngine()
    load(eng, 50, 1)
    // upsert k=7 with a=999 first — the predicate must see the MERGED value
    eng.ingest("db", "t", spark.createDataFrame(
      Seq(Row(7L, 999.0, 70.0, "t7")).asJava, schema), Some(Version(2, 2)))
    eng.updateWhere("db", "t", Seq("tag" -> "'hit'"), "a = 999.0")
    val hits = eng.scan("db", "t").filter(col("tag") === "hit").collect()
    assert(hits.map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("refusals: key SET, sequence SET, unknown columns, non-Unique model") {
    val eng = mkEngine(seq = Some("b"))
    load(eng, 10, 1)
    assertThrows[IllegalArgumentException](
      eng.updateWhere("db", "t", Seq("k" -> "k + 1"), "true"))
    assertThrows[IllegalArgumentException](
      eng.updateWhere("db", "t", Seq("b" -> "b + 1"), "true"))
    assertThrows[IllegalArgumentException](
      eng.updateWhere("db", "t", Seq("a" -> "nope + 1"), "true"))
    assertThrows[IllegalArgumentException](
      eng.updateWhere("db", "t", Seq("a" -> "1.0"), "nope = 2"))
    assertThrows[IllegalArgumentException](
      eng.updateWhere("db", "t", Seq.empty, "true"))
    assertThrows[IllegalArgumentException](
      eng.updateWhere("db", "t", Seq("a" -> "1.0", "a" -> "2.0"), "true"))
    val dupEng = mkEngine(keysType = KeysType.Duplicate)
    load(dupEng, 10, 1)
    assertThrows[IllegalArgumentException](
      dupEng.updateWhere("db", "t", Seq("a" -> "1.0"), "true"))
  }

  test("sequence-column table: the update WINS a sequence tie (carried value)") {
    val eng = mkEngine(seq = Some("b"))
    load(eng, 20, 1)
    eng.updateWhere("db", "t", Seq("a" -> "a + 500.0"), "k = 4")
    val r = eng.scan("db", "t").filter(col("k") === 4L).collect().head
    assert(r.getDouble(1) == 504.0,
      "update carries the stored sequence, ties on it, wins on version")
    // a genuinely newer sequence still beats the update
    eng.ingest("db", "t", spark.createDataFrame(
      Seq(Row(4L, 7.0, 99999.0, "newer")).asJava, schema), Some(Version(3, 3)))
    val r2 = eng.scan("db", "t").filter(col("k") === 4L).collect().head
    assert(r2.getDouble(1) == 7.0 && r2.getString(3) == "newer")
  }

  test("empty match publishes an empty version; data unchanged") {
    val eng = mkEngine()
    load(eng, 10, 1)
    val meta = eng.updateWhere("db", "t", Seq("a" -> "0.0"), "k > 100000")
    assert(meta.numRows == 0L)
    assert(eng.scan("db", "t").agg(sum(col("a"))).collect().head.getDouble(0) == 45.0)
  }

  test("optimistic concurrency: a writer racing the update trips the " +
    "version-collision guard loudly") {
    val eng = mkEngine()
    load(eng, 10, 1)
    // simulate the race: another load lands at v2 AFTER updateWhere captured
    // its snapshot — which is exactly the version the update will claim.
    // Publishing the same visible version must refuse, never lose data.
    load(eng, 10, 2)
    val ex = intercept[IllegalArgumentException] {
      // claim v2 again, as an in-flight update that captured v0=1 would
      eng.ingest("db", "t", spark.createDataFrame(
        Seq(Row(0L, 1.0, 2.0, "x")).asJava, schema), Some(Version(2, 2)))
    }
    assert(ex.getMessage.toLowerCase.contains("version"))
  }

  test("SQL face: regex route, exec-time split, strings/commas/WHERE nesting") {
    val eng = mkEngine()
    load(eng, 30, 1)
    graft.sql.GraftSql.bind(spark, eng)
    val out = graft.sql.GraftSql.sql(spark,
      "UPDATE db.t SET tag = concat(tag, ',where,'), a = coalesce(a, 0.0) + " +
        "1.0 WHERE k IN (1, 2) AND tag != 'x,where'").collect().head
    assert(out.getAs[Long]("num_rows") == 2L)
    val r = eng.scan("db", "t").filter(col("k") === 2L).collect().head
    assert(r.getString(3) == "t2,where," && r.getDouble(1) == 3.0)
    // malformed tails fail loudly on a CLAIMED table
    assertThrows[graft.sql.GraftParseException](
      graft.sql.GraftSql.sql(spark, "UPDATE db.t SET a = 1.0"))
    assertThrows[graft.sql.GraftParseException](
      graft.sql.GraftSql.sql(spark, "UPDATE db.t SET WHERE k = 1"))
    // inside an open load group: refuse (the update can't stage)
    graft.sql.GraftSql.sql(spark, "BEGIN LOAD GROUP")
    try assertThrows[IllegalArgumentException](
      graft.sql.GraftSql.sql(spark, "UPDATE db.t SET a = 1.0 WHERE true"))
    finally graft.sql.GraftSql.sql(spark, "ABORT LOAD GROUP")
    // an UPDATE naming a table the engine does NOT own delegates to Spark
    // (whose parser then reports ITS error, not a graft parse error)
    val d = intercept[Exception](
      graft.sql.GraftSql.sql(spark, "UPDATE nodb.nope SET a = 1"))
    assert(!d.isInstanceOf[graft.sql.GraftParseException])
  }
}
