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

/** ADD COLUMN ... DEFAULT: metadata-only backfill. Rows written BEFORE the
  * column existed read the declared default; rows written after — including
  * explicit NULLs — are untouched; loads that omit the column fill it at
  * ingest; full compaction materializes the fill; the default survives
  * engine restarts with the persisted catalog.
  */
class ColumnDefaultSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val baseSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", DoubleType)))
  private val fullSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", DoubleType),
    StructField("lang", StringType)))

  private def mkEngine(wh: java.nio.file.Path =
      Files.createTempDirectory("graft-cd-wh-")): OlapEngine = {
    val eng = new OlapEngine(spark, wh)
    if (eng.catalog.getTable("db", "t").isEmpty) {
      eng.createDatabase("db")
      eng.createTable(TableDef(
        db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
          ColumnSpec.key("k", LongType), ColumnSpec.value("v", DoubleType))),
        bucketColumn = Some("k"), numBuckets = 2))
    }
    eng
  }

  test("pre-add rowsets read the default; post-add NULLs stay NULL") {
    val eng = mkEngine()
    eng.ingest("db", "t", spark.createDataFrame(
      (0L until 10L).map(i => Row(i, i * 1.0)).asJava, baseSchema),
      Some(Version(1, 1)))
    eng.addColumn("db", "t", ColumnSpec.value("lang", StringType), Some("en"))
    eng.ingest("db", "t", spark.createDataFrame(
      Seq(Row(100L, 1.0, "fr"), Row(101L, 2.0, null)).asJava, fullSchema),
      Some(Version(2, 2)))
    val got = eng.scan("db", "t").select("k", "lang").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    assert(got(0L) == "en" && got(9L) == "en", "pre-add rows read the default")
    assert(got(100L) == "fr")
    assert(got(101L) == null, "an explicit NULL written after the add stays NULL")
    // a load omitting the defaulted column fills it at ingest
    eng.ingest("db", "t", spark.createDataFrame(
      Seq(Row(200L, 3.0)).asJava, baseSchema), Some(Version(3, 3)))
    assert(eng.scan("db", "t").filter(col("k") === 200L)
      .select("lang").head.getString(0) == "en")
    // compaction materializes the fill; answers unchanged
    val before = eng.scan("db", "t").orderBy("k").collect().toSeq
    eng.compact("db", "t")
    assert(eng.scan("db", "t").orderBy("k").collect().toSeq == before)
  }

  test("the default survives an engine restart; bad literals are refused") {
    val wh = Files.createTempDirectory("graft-cd-wh-")
    val eng = mkEngine(wh)
    eng.ingest("db", "t", spark.createDataFrame(
      Seq(Row(1L, 1.0)).asJava, baseSchema), Some(Version(1, 1)))
    eng.addColumn("db", "t", ColumnSpec.value("n", IntegerType), Some("42"))
    val eng2 = new OlapEngine(spark, wh)
    assert(eng2.scan("db", "t").select("n").head.getInt(0) == 42)
    intercept[IllegalArgumentException] {
      eng2.addColumn("db", "t", ColumnSpec.value("m", IntegerType),
        Some("not-a-number"))
    }
    // CREATE-time defaults get the same loud validation as the ALTER path
    intercept[Exception] {
      eng2.createTable(TableDef(
        db = "db", name = "bad", schema = TableSchema(KeysType.Duplicate, Seq(
          ColumnSpec.key("k", LongType), ColumnSpec.value("n", IntegerType))),
        bucketColumn = Some("k"), numBuckets = 1,
        columnDefaults = Map("n" -> "not-a-number")))
    }
    assert(eng2.catalog.getTable("db", "bad").isEmpty,
      "a refused CREATE must leave no catalog entry")
  }

  test("SQL faces: ALTER ADD COLUMN DEFAULT + SHOW CREATE round trip") {
    val eng = mkEngine()
    graft.sql.GraftSql.bind(spark, eng)
    try {
      def g(sql: String) = graft.sql.GraftSql.sql(spark, sql)
      g("CREATE DATABASE g_cd").collect()
      g("""CREATE TABLE g_cd.t (k BIGINT, v DOUBLE, s VARCHAR(8) DEFAULT 'x')
          |DUPLICATE KEY (k) DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin).collect()
      assert(eng.catalog.getTable("g_cd", "t").get.columnDefaults ==
        Map("s" -> "x"))
      g("INSERT INTO g_cd.t VALUES (1, 1.5, 'a')").collect()
      g("ALTER TABLE g_cd.t ADD COLUMN src STRING DEFAULT 'web'").collect()
      g("INSERT INTO g_cd.t VALUES (2, 2.5, 'b', 'api')").collect()
      g("CREATE TEMP VIEW g_cd_t AS SCAN g_cd.t").collect()
      val rows = spark.sql("SELECT k, src FROM g_cd_t ORDER BY k").collect()
      assert(rows.map(r => r.getLong(0) -> r.getString(1)).toSeq ==
        Seq(1L -> "web", 2L -> "api"))
      // SHOW CREATE renders the defaults and the rendered DDL re-parses
      val ddl = g("SHOW CREATE TABLE g_cd.t").collect().head.getString(0)
      assert(ddl.contains("DEFAULT 'x'") && ddl.contains("DEFAULT 'web'"), ddl)
      val stmt = graft.sql.GraftSqlParser.parse(
        ddl.replace("g_cd.t", "g_cd.t2")).get
        .asInstanceOf[graft.sql.GraftStatement.CreateTable]
      assert(stmt.defaults == Map("s" -> "x", "src" -> "web"))
    } finally graft.sql.GraftSql.unbind(spark)
  }
}
