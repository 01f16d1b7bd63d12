package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.manifest.Version
import graft.model._

/** The GC-vs-pinned-reader race (SURVEY §7's "readers must pin a manifest
  * version for the whole query" hard part): a DataFrame resolved against a
  * rowset set that compaction + GC then physically deletes mid-flight must
  * either complete with the FULL resolved answer or fail with a loud error —
  * NEVER silently return the surviving subset.
  *
  * This engine's contract is the loud-failure arm: resolved plans hold
  * concrete parquet paths, and Spark's scan throws on a missing file as long
  * as `spark.sql.files.ignoreMissingFiles` stays false — which the
  * [[OlapEngine]] constructor now enforces, because with that flag on the
  * race would degrade to silent partial rows (the one outcome the contract
  * forbids). A production deployment wanting the complete-instead-of-fail
  * arm layers a retention window (Retention.KeepMs) sized to its longest
  * query, which keeps retired rowsets on disk while in-flight readers drain
  * — RetentionSpec covers that side.
  */
class GcReaderRaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false), StructField("v", LongType)))

  private def mkEngine(s: org.apache.spark.sql.SparkSession = spark): OlapEngine = {
    val eng = new OlapEngine(s, Files.createTempDirectory("graft-race-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = 2, retention = Retention.Manual))
    eng.ingest("db", "t", spark.createDataFrame(
      (0L until 10L).map(i => org.apache.spark.sql.Row(i, i)).asJava, schema),
      Some(Version(1, 1)))
    eng.ingest("db", "t", spark.createDataFrame(
      (10L until 30L).map(i => org.apache.spark.sql.Row(i, i)).asJava, schema),
      Some(Version(2, 2)))
    eng
  }

  test("a reader resolved before compact+gc never silently loses rows") {
    val eng = mkEngine()
    // resolve the plan against the two load rowsets (paths captured here)
    val pinned = eng.scan("db", "t")
    // compact retires both load rowsets into one; Manual gc deletes them
    eng.compact("db", "t")
    val dropped = eng.gc("db", "t")
    assert(dropped.nonEmpty, "gc must physically delete the retired rowsets")
    // the in-flight frame must now either produce the FULL answer or throw
    // loudly — the silent-partial outcome (some rows, fewer than 30) is the
    // forbidden one
    val outcome = scala.util.Try(pinned.collect())
    outcome match {
      case scala.util.Success(rows) =>
        assert(rows.length == 30,
          s"silent partial read: ${rows.length}/30 rows after gc raced the reader")
      case scala.util.Failure(e) =>
        // Spark's missing-input failure: FileNotFound (possibly wrapped in
        // a SparkException task failure) — loud and diagnosable
        val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(t => t.getClass.getName + ": " + String.valueOf(t.getMessage))
          .mkString(" <- ")
        assert(msgs.contains("FileNotFound") || msgs.contains("does not exist"),
          s"race must fail on the missing files, not something else: $msgs")
    }
    // a FRESH resolution after gc serves the compacted rowset: full answer
    assert(eng.scan("db", "t").count() == 30)
  }

  test("retention window = the complete-instead-of-fail arm: gc after " +
    "compaction retains rowsets inside KeepMs, so the pinned reader drains") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-race2-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = 2,
      retention = Retention.KeepMs(24L * 3600 * 1000)))
    eng.ingest("db", "t", spark.createDataFrame(
      (0L until 30L).map(i => org.apache.spark.sql.Row(i, i)).asJava, schema),
      Some(Version(1, 1)))
    val pinned = eng.scan("db", "t")
    eng.compact("db", "t") // auto-gc runs, but the window retains the rowset
    assert(pinned.collect().length == 30,
      "inside the retention window the pinned reader must drain completely")
  }

  test("flipping ignoreMissingFiles AFTER construction cannot re-enable the " +
    "silent-partial outcome (the read path pins the option per scan)") {
    val s2 = spark.newSession()
    val eng = mkEngine(s2) // conf is false here, so construction succeeds
    val pinned = eng.scan("db", "t")
    // a later (mis)configuration of the shared session must not weaken the
    // contract for plans the engine already resolved — or resolves next
    s2.conf.set("spark.sql.files.ignoreMissingFiles", "true")
    try {
      eng.compact("db", "t")
      assert(eng.gc("db", "t").nonEmpty)
      val outcome = scala.util.Try(pinned.collect())
      outcome match {
        case scala.util.Success(rows) =>
          assert(rows.length == 30,
            s"silent partial read: ${rows.length}/30 rows with the conf flipped on")
        case scala.util.Failure(e) =>
          val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
            .map(t => t.getClass.getName + ": " + String.valueOf(t.getMessage))
            .mkString(" <- ")
          assert(msgs.contains("FileNotFound") || msgs.contains("does not exist"),
            s"race must fail on the missing files, not something else: $msgs")
      }
    } finally s2.conf.set("spark.sql.files.ignoreMissingFiles", "false")
  }

  test("the engine refuses a session where missing files would be silent") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.ignoreMissingFiles", "true")
    val e = intercept[IllegalArgumentException] {
      new OlapEngine(s2, Files.createTempDirectory("graft-race3-wh-"))
    }
    assert(e.getMessage.contains("ignoreMissingFiles"))
  }
}
