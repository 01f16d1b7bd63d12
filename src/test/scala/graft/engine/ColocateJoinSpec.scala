package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.manifest.Version
import graft.model._

/** Colocate join: two tables sharing the hash-bucketing spec join with ZERO
  * shuffle — bucket i joins bucket i, because both sides routed with the
  * same FNV-1a at write time (the Doris colocation-group contract).
  */
class ColocateJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private def engine(): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-cj-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "fact", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = 4))
    eng.createTable(TableDef(
      db = "db", name = "agg", schema = TableSchema(KeysType.Aggregate, Seq(
        ColumnSpec.key("ak", LongType),
        ColumnSpec.value("total", DoubleType, AggType.Sum))),
      bucketColumn = Some("ak"), numBuckets = 4))
    val factRows = (0L until 200L).map(i => org.apache.spark.sql.Row(i % 50, i))
    eng.ingest("db", "fact", spark.createDataFrame(factRows.asJava, StructType(Seq(
      StructField("k", LongType, nullable = false), StructField("v", LongType)))),
      Some(Version(1, 1)))
    val aggSchema = StructType(Seq(
      StructField("ak", LongType, nullable = false), StructField("total", DoubleType)))
    eng.ingest("db", "agg", spark.createDataFrame(
      (0L until 50L).map(i => org.apache.spark.sql.Row(i, i.toDouble)).asJava, aggSchema),
      Some(Version(1, 1)))
    eng.ingest("db", "agg", spark.createDataFrame(
      (0L until 50L by 2).map(i => org.apache.spark.sql.Row(i, 100.0)).asJava, aggSchema),
      Some(Version(2, 2)))
    eng
  }

  test("equivalence: colocate join = plain scan join; zero Exchange in the plan") {
    val eng = engine()
    val co = eng.colocateJoin("db", "fact", "db", "agg")
    val plain = eng.scan("db", "fact").join(eng.scan("db", "agg"),
      col("k") === col("ak"), "inner")
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(co.collect().map(key).sorted.toSeq == plain.collect().map(key).sorted.toSeq)
    assert(co.rdd.getNumPartitions == 4)
    val p = co.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("merge-on-read runs per bucket: Aggregate side resolves Sum across rowsets") {
    val eng = engine()
    val co = eng.colocateJoin("db", "fact", "db", "agg")
    // key 0: total = 0.0 + 100.0 (two rowsets merged); key 1: 1.0 only
    val got = co.filter(col("v") === 0L).select("total").collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(100.0))
    val g1 = co.filter(col("v") === 1L).select("total").collect().map(_.getDouble(0))
    assert(g1.toSeq == Seq(1.0))
  }

  test("partitioning reuse: aggregating the join key after the join adds no shuffle") {
    val eng = engine()
    val agged = eng.colocateJoin("db", "fact", "db", "agg")
      .groupBy(col("k"))
      .agg(sum(col("v")).as("sv"), max(col("total")).as("mt"))
    val p = agged.queryExecution.executedPlan.toString
    // zero Exchange end-to-end: the join consumes the declared bucket
    // partitioning AND the aggregation reuses it (same keys)
    assert(!p.contains("Exchange"), p)
    assert(agged.count() == 50L)
  }

  test("parallelism scales with bucket count: a 16-bucket group runs 16 tasks") {
    // the documented colocate trade — join parallelism = bucket count — is a
    // DESIGN DIAL, not a cap: size buckets to the cluster and the same
    // zero-shuffle plan fans out across 4x the tasks
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-cj16-wh-"))
    eng.createDatabase("db")
    def mk(name: String, keyCol: String): Unit = eng.createTable(TableDef(
      db = "db", name = name, schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key(keyCol, LongType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some(keyCol), numBuckets = 16))
    mk("fact16", "k"); mk("dim16", "ak")
    val schema = (n: String) => StructType(Seq(
      StructField(n, LongType, nullable = false), StructField("v", LongType)))
    eng.ingest("db", "fact16", spark.createDataFrame(
      (0L until 400L).map(i => org.apache.spark.sql.Row(i % 100, i)).asJava,
      schema("k")), Some(Version(1, 1)))
    eng.ingest("db", "dim16", spark.createDataFrame(
      (0L until 100L).map(i => org.apache.spark.sql.Row(i, i * 10)).asJava,
      schema("ak")), Some(Version(1, 1)))
    val co = eng.colocateJoin("db", "fact16", "db", "dim16")
    assert(co.rdd.getNumPartitions == 16)
    assert(!co.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(co.count() == 400L)
  }

  test("under-bucketed colocation group warns; adequately-bucketed stays quiet") {
    // a 4-bucket group on a 32-slot cluster caps the join at 1/8 of the
    // cluster — exactly the q133 fixture shape; the warning makes the
    // documented trade enforced instead of remembered
    assert(OlapEngine.colocateParallelismWarning(4, 32, "t1 ⋈ t2").isDefined)
    assert(OlapEngine.colocateParallelismWarning(4, 32, "t1 ⋈ t2")
      .get.contains("4-way"))
    // >= slots/4 is the documented floor: 8 buckets on 32 slots is fine,
    // and any bucket count saturates a small cluster
    assert(OlapEngine.colocateParallelismWarning(8, 32, "t").isEmpty)
    assert(OlapEngine.colocateParallelismWarning(16, 32, "t").isEmpty)
    assert(OlapEngine.colocateParallelismWarning(4, 4, "t").isEmpty)
  }

  test("bucket-count mismatch and non-hash bucketing refuse") {
    val eng = engine()
    eng.createTable(TableDef(
      db = "db", name = "other", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = 8))
    intercept[IllegalArgumentException] {
      eng.colocateJoin("db", "fact", "db", "other")
    }
  }
}
