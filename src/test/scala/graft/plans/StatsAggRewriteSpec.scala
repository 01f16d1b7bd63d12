package graft.plans

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.engine.OlapEngine
import graft.manifest.Version
import graft.model._

/** Transparent metadata aggregates: group-less MIN/MAX/COUNT over a full
  * engine snapshot scan answer from the manifest with the scan deleted from
  * the plan; anything the zone maps can't serve exactly is left untouched.
  */
class StatsAggRewriteSpec extends AnyFunSuite {
  private lazy val spark = { val s = SparkTestSession.spark; graft.GraftExtensions.register(s); s }
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", DoubleType),
    StructField("s", StringType)))

  private def mkEngine(model: KeysType = KeysType.Duplicate): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-sar-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(model, Seq(
        ColumnSpec.key("k", LongType), ColumnSpec.value("v", DoubleType),
        ColumnSpec.value("s", StringType))),
      bucketColumn = Some("k"), numBuckets = 2))
    eng.ingest("db", "t", spark.createDataFrame(
      (0L until 100L).map(i =>
        Row(i, if (i == 7) null else i * 2.0, f"s$i%03d")).asJava, schema),
      Some(Version(1, 1)))
    eng.ingest("db", "t", spark.createDataFrame(
      (100L until 150L).map(i => Row(i, i * 2.0, f"s$i%03d")).asJava, schema),
      Some(Version(2, 2)))
    eng
  }

  private def scans(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
    }.size

  private def agg(eng: OlapEngine): DataFrame =
    eng.scan("db", "t").agg(
      min(col("k")).as("mnk"), max(col("k")).as("mxk"),
      min(col("v")).as("mnv"), max(col("v")).as("mxv"),
      min(col("s")).as("mns"), max(col("s")).as("mxs"),
      count(lit(1)).as("n"), count(col("v")).as("nv"))

  test("group-less MIN/MAX/COUNT serve from metadata with no scan in the plan") {
    val eng = mkEngine()
    val df = agg(eng)
    assert(scans(df) == 0, df.queryExecution.optimizedPlan.toString)
    val served = df.collect().head
    StatsAggRewrite.setEnabled(false)
    try {
      val scanned = agg(eng)
      assert(scans(scanned) == 2)
      assert(served == scanned.collect().head,
        "metadata-served row must equal the scanned aggregate")
    } finally StatsAggRewrite.setEnabled(true)
    assert(served.getLong(6) == 150L && served.getLong(7) == 149L) // one null v
    assert(served.getDouble(3) == 298.0 && served.getString(5) == "s149")
  }

  test("filters, grouping, distinct, and delete markers refuse the rewrite") {
    val eng = mkEngine()
    assert(scans(eng.scan("db", "t").filter(col("k") > 10L)
      .agg(max(col("k")).as("m"))) >= 1)
    assert(scans(eng.scan("db", "t").groupBy(col("s"))
      .agg(max(col("k")).as("m"))) >= 1)
    assert(scans(eng.scan("db", "t")
      .agg(count_distinct(col("k")).as("m"))) >= 1)
    eng.deleteWhere("db", "t", "k = 149", Some(Version(3, 3)))
    val df = eng.scan("db", "t").agg(max(col("k")).as("m"))
    assert(scans(df) >= 1, "delete markers must force the scan")
    assert(df.collect().head.getLong(0) == 148L)
  }

  test("non-Duplicate models refuse the rewrite (merge-on-read suppresses rows)") {
    val eng = mkEngine(KeysType.Unique)
    val df = eng.scan("db", "t").agg(max(col("k")).as("m"))
    assert(scans(df) >= 1)
    assert(df.collect().head.getLong(0) == 149L)
  }

  test("a new load is visible immediately (freshness is per-query, not cached)") {
    val eng = mkEngine()
    assert(agg(eng).collect().head.getLong(1) == 149L)
    eng.ingest("db", "t", spark.createDataFrame(
      Seq(Row(999L, 5.0, "zzz")).asJava, schema), Some(Version(3, 3)))
    val df = agg(eng)
    assert(scans(df) == 0)
    val r = df.collect().head
    assert(r.getLong(1) == 999L && r.getString(5) == "zzz" && r.getLong(6) == 151L)
  }
}
