package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.manifest.Version
import graft.model._

/** Colocate join at PRODUCTION bucket counts: the warning at
  * OlapEngine.colocateParallelismWarning recommends buckets >= slots/4,
  * which on a real cluster means hundreds — and `side()` builds one plan per
  * bucket on the driver, so plan-compilation time itself becomes a join cost
  * that never shows up at the 4-bucket fixture scale. This spec pins the
  * driver-side build cost at 64/256 buckets and the result's correctness.
  */
class ColocateJoinScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private def mkEngine(buckets: Int): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory(s"graft-cjs$buckets-wh-"))
    eng.createDatabase("db")
    def mk(name: String, keyCol: String): Unit = eng.createTable(TableDef(
      db = "db", name = name, schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key(keyCol, LongType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some(keyCol), numBuckets = buckets))
    mk("fact", "k"); mk("dim", "ak")
    val schema = (n: String) => StructType(Seq(
      StructField(n, LongType, nullable = false), StructField("v", LongType)))
    eng.ingest("db", "fact", spark.createDataFrame(
      (0L until 2000L).map(i => org.apache.spark.sql.Row(i % 500, i)).asJava,
      schema("k")), Some(Version(1, 1)))
    eng.ingest("db", "dim", spark.createDataFrame(
      (0L until 500L).map(i => org.apache.spark.sql.Row(i, i * 10)).asJava,
      schema("ak")), Some(Version(1, 1)))
    eng
  }

  private def timedBuild(eng: OlapEngine): (Double, org.apache.spark.sql.DataFrame) = {
    val t0 = System.nanoTime()
    val co = eng.colocateJoin("db", "fact", "db", "dim")
    co.queryExecution.executedPlan // force full planning of the join
    ((System.nanoTime() - t0) / 1e9, co)
  }

  test("64-bucket colocate join: correct, zero Exchange, bounded driver build time") {
    val eng = mkEngine(64)
    val (sec, co) = timedBuild(eng)
    System.err.println(f"[colocate-scale] 64-bucket plan build: $sec%.2fs")
    assert(co.rdd.getNumPartitions == 64)
    assert(!co.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(co.count() == 2000L)
    // driver plan assembly at 64 buckets must stay interactive — the
    // hoisted-snapshot + pooled-compile path builds in ~1s where the serial
    // per-bucket loop took 28s (each bucket re-listing every bucket dir)
    assert(sec < 10.0, f"64-bucket colocate plan build took $sec%.1fs")
  }

  test("256-bucket colocate join: correct and the build scales near-linearly") {
    val eng = mkEngine(256)
    val (sec, co) = timedBuild(eng)
    System.err.println(f"[colocate-scale] 256-bucket plan build: $sec%.2fs")
    assert(co.rdd.getNumPartitions == 256)
    assert(!co.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(co.count() == 2000L)
    // ~1.7s measured (vs 256s serial — the per-bucket re-listing made the
    // old loop quadratic in bucket count); generous bound for host noise
    assert(sec < 20.0, f"256-bucket colocate plan build took $sec%.1fs")
  }
}
