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

/** Zone-map top-k: the two-phase bound refinement is EXACT (equal to the
  * full-table sort) while reading only the rowsets whose bounds can reach
  * the answer; anything unservable falls back to the full scan.
  */
class TopKStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", DoubleType)))

  /** Four loads over interleaved-but-bounded bands: load i holds keys
    * [i*1000, i*1000+500), so bands are disjoint and ordered.
    */
  private def mkEngine(): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-topk-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType), ColumnSpec.value("v", DoubleType))),
      bucketColumn = Some("k"), numBuckets = 2))
    (0 until 4).foreach { i =>
      eng.ingest("db", "t", spark.createDataFrame(
        (0L until 500L).map(j =>
          Row(i * 1000L + j, if (j == 13) null else (i * 1000L + j) * 0.5))
          .asJava, schema),
        Some(Version(i + 1L, i + 1L)))
    }
    eng
  }

  test("top-k equals the full sort and reads only the reachable rowsets") {
    val eng = mkEngine()
    val (df, read) = eng.topKByStats("db", "t", "k", 100)
    assert(read == 1, s"top-100 lives in the last band; read $read rowsets")
    val expect = eng.scan("db", "t").orderBy(col("k").desc_nulls_last).limit(100)
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(df.select("k").collect().map(_.getLong(0)).toSeq == expect)
    // k larger than one band pulls in the next rowset
    val (df2, read2) = eng.topKByStats("db", "t", "k", 600)
    assert(read2 == 2, s"top-600 spans two bands; read $read2")
    assert(df2.count() == 600L)
    // ascending mirrors with min bounds
    val (df3, read3) = eng.topKByStats("db", "t", "k", 100, desc = false)
    assert(read3 == 1)
    assert(df3.select("k").collect().map(_.getLong(0)).toSeq ==
      (0L until 100L))
  }

  test("Unique tables serve key top-k; the subset read merges on read") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-topk-uq-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "u", schema = TableSchema(KeysType.Unique, Seq(
        ColumnSpec.key("k", LongType), ColumnSpec.value("v", DoubleType))),
      bucketColumn = Some("k"), numBuckets = 2))
    // two banded loads + an upsert load touching only the TOP band
    eng.ingest("db", "u", spark.createDataFrame(
      (0L until 1000L).map(j => Row(j, j * 0.5)).asJava, schema),
      Some(Version(1, 1)))
    eng.ingest("db", "u", spark.createDataFrame(
      (1000L until 2000L).map(j => Row(j, j * 0.5)).asJava, schema),
      Some(Version(2, 2)))
    eng.ingest("db", "u", spark.createDataFrame(
      (1900L until 2000L).map(j => Row(j, -1.0)).asJava, schema),
      Some(Version(3, 3)))
    val (df, read) = eng.topKByStats("db", "u", "k", 50)
    assert(read == 2, s"top band + its upsert rowset; read $read")
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(-_._1)
    assert(got.map(_._1).toSeq == (1950L until 2000L).reverse)
    assert(got.forall(_._2 == -1.0), "merged rows must show the v3 upserts")
    // non-key column refuses the serve (a key's value can move across loads)
    assert(eng.topKByStats("db", "u", "v", 5)._2 == -1)
    // a tombstone anywhere forces the fallback — still exact
    eng.ingestDeletes("db", "u", spark.createDataFrame(
      Seq(Row(1999L, null)).asJava, schema).select("k"), Some(Version(4, 4)))
    val (df2, read2) = eng.topKByStats("db", "u", "k", 5)
    assert(read2 == -1)
    assert(df2.collect().map(_.getLong(0)).toSeq == Seq(1998L, 1997L, 1996L, 1995L, 1994L))
    // ... and metadata MIN/MAX refuses too (1999 is gone; 1998 is the truth)
    val (mm, fromMeta) = eng.minMaxStats("db", "u", Seq("k"))
    assert(!fromMeta && mm.collect().head.getLong(1) == 1998L)
  }

  test("Aggregate tables serve key top-k; the subset read Sum-merges") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-topk-ag-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "a", schema = TableSchema(KeysType.Aggregate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", DoubleType, AggType.Sum))),
      bucketColumn = Some("k"), numBuckets = 2))
    // low band, then a top band loaded TWICE as partial sums
    eng.ingest("db", "a", spark.createDataFrame(
      (0L until 1000L).map(j => Row(j, 1.0)).asJava, schema),
      Some(Version(1, 1)))
    eng.ingest("db", "a", spark.createDataFrame(
      (1000L until 2000L).map(j => Row(j, 2.0)).asJava, schema),
      Some(Version(2, 2)))
    eng.ingest("db", "a", spark.createDataFrame(
      (1000L until 2000L).map(j => Row(j, 3.0)).asJava, schema),
      Some(Version(3, 3)))
    val (df, read) = eng.topKByStats("db", "a", "k", 10)
    assert(read == 2, s"both top-band partials, low band pruned; read $read")
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(-_._1)
    assert(got.map(_._1).toSeq == (1990L until 2000L).reverse)
    assert(got.forall(_._2 == 5.0), "subset merge must SUM both partials")
    // non-key column refuses (its merged value is not any row's value)
    assert(eng.topKByStats("db", "a", "v", 5)._2 == -1)
    // metadata MIN/MAX serves the key, refuses the value column
    val (mm, fromMeta) = eng.minMaxStats("db", "a", Seq("k"))
    assert(fromMeta && mm.collect().head.toSeq == Seq(0L, 1999L))
    assert(!eng.minMaxStats("db", "a", Seq("v"))._2)
  }

  test("Unique raw-count prefix grows until distinct keys cover k") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-topk-up-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "u", schema = TableSchema(KeysType.Unique, Seq(
        ColumnSpec.key("k", LongType), ColumnSpec.value("v", DoubleType))),
      bucketColumn = Some("k"), numBuckets = 1))
    // load 1: keys [100, 110) upserted FIVE times each (50 raw rows, 10 keys)
    (0 until 5).foreach { i =>
      eng.ingest("db", "u", spark.createDataFrame(
        (100L until 110L).map(j => Row(j, i * 1.0)).asJava, schema),
        Some(Version(i + 1L, i + 1L)))
    }
    // load 6: keys [0, 100)
    eng.ingest("db", "u", spark.createDataFrame(
      (0L until 100L).map(j => Row(j, 0.0)).asJava, schema),
      Some(Version(6, 6)))
    // top-30 needs 30 DISTINCT keys: the five upsert rowsets hold only 10,
    // so the prefix must grow into the low band — and stay exact
    val (df, read) = eng.topKByStats("db", "u", "k", 30)
    assert(read >= 2)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == (80L until 110L))
    // fewer distinct keys than k anywhere: loud-correct fallback
    val (df3, read3) = eng.topKByStats("db", "u", "k", 500)
    assert(read3 == -1 && df3.count() == 110L)
  }

  test("null values never rank; double column serves; fallbacks are loud-correct") {
    val eng = mkEngine()
    // v has a null per band; nulls-last means they never enter the top-k
    val (df, read) = eng.topKByStats("db", "t", "v", 50)
    assert(read == 1)
    assert(!df.select("v").collect().exists(_.isNullAt(0)))
    assert(df.select("v").collect().map(_.getDouble(0)).toSeq ==
      eng.scan("db", "t").orderBy(col("v").desc_nulls_last).limit(50)
        .select("v").collect().map(_.getDouble(0)).toSeq)
    // a delete marker forces the full-scan fallback — still exact
    eng.deleteWhere("db", "t", "k = 3499", Some(Version(5, 5)))
    val (df4, read4) = eng.topKByStats("db", "t", "k", 10)
    assert(read4 == -1)
    assert(df4.select("k").collect().map(_.getLong(0)).max == 3498L)
  }
}
