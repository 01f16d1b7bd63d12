package graft.plans

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.catalog._
import graft.engine.{MvJoinDef, OlapEngine}
import graft.manifest.Version
import graft.model._

/** Transparent join-MV selection ([[JoinMvRewrite]]): the optimizer replaces
  * a fact⋈dim + GROUP BY over the base engine tables with a scan of the
  * fresh materialized view — and refuses when either table has moved, the
  * grouping/filters aren't covered, or the join/aggregate shape differs.
  */
class JoinMvRewriteSpec extends AnyFunSuite {
  private lazy val spark = { val s = SparkTestSession.spark; graft.GraftExtensions.register(s); s }

  import org.apache.spark.sql.types._
  import org.apache.spark.sql.Row
  import scala.jdk.CollectionConverters._

  private val factSchema = StructType(Seq(
    StructField("fk", LongType), StructField("cat", StringType),
    StructField("v", LongType)))
  private val dimSchema = StructType(Seq(
    StructField("dk", LongType), StructField("seg", StringType)))

  /** 100 fact rows over 10 dim keys; dim key i carries segment s{i%3}. */
  private def fixture(): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-mv-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "fact", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("fk", LongType),
        ColumnSpec.value("cat", StringType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("fk"), numBuckets = 2))
    eng.createTable(TableDef(
      db = "db", name = "dim", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("dk", LongType),
        ColumnSpec.value("seg", StringType))),
      bucketColumn = Some("dk"), numBuckets = 2))
    def factRows(lo: Int, hi: Int) = spark.createDataFrame(
      (lo until hi).map(i => Row((i % 10).toLong, s"c${i % 2}", i.toLong)).asJava,
      factSchema)
    eng.ingest("db", "fact", factRows(0, 60), Some(Version(1, 1)))
    eng.ingest("db", "fact", factRows(60, 100), Some(Version(2, 2)))
    eng.ingest("db", "dim", spark.createDataFrame(
      (0 until 10).map(i => Row(i.toLong, s"s${i % 3}")).asJava, dimSchema),
      Some(Version(1, 1)))
    eng.mvs.materialize(mvDef)
    eng
  }

  private val mvDef = MvJoinDef(
    name = "by_seg_cat",
    factDb = "db", factTable = "fact", dimDb = "db", dimTable = "dim",
    factKey = "fk", dimKey = "dk",
    groupCols = Seq("seg", "cat"),
    aggs = Seq(("s_v", "v", AggType.Sum), ("mx_v", "v", AggType.Max)),
    countCol = Some("n_rows"))

  private def usesMv(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.exists(_.toString.contains("mvs"))
          case _ => false
        }
    }.exists(identity)

  private def hasJoin(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.nonEmpty

  private def joined(eng: OlapEngine): DataFrame =
    eng.scan("db", "fact").join(eng.scan("db", "dim"),
      col("fk") === col("dk"), "inner")

  private def bySeg(eng: OlapEngine): DataFrame =
    joined(eng).groupBy(col("seg"))
      .agg(sum(col("v")).as("s_v"), max(col("v")).as("mx_v"),
        count(lit(1)).as("n"))

  /** Ground truth from the generators: fact i -> dim i%10 -> seg (i%10)%3. */
  private def truth(pred: Int => Boolean = _ => true): Map[String, (Long, Long, Long)] =
    (0 until 100).filter(pred).groupBy(i => s"s${(i % 10) % 3}")
      .map { case (s, is) =>
        s -> (is.map(_.toLong).sum, is.max.toLong, is.size.toLong) }

  test("join+aggregate over base tables is answered from the MV, exactly") {
    val eng = fixture()
    val q = bySeg(eng)
    assert(usesMv(q), q.queryExecution.optimizedPlan.toString)
    assert(!hasJoin(q), "the join itself must be eliminated")
    val got = q.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == truth())
  }

  test("re-aggregation: grouping by a subset of MV dims still rewrites") {
    val eng = fixture()
    // global aggregate path: group by cat (the other dim) — still covered
    val q = joined(eng).groupBy(col("cat")).agg(sum(col("v")).as("s_v"))
    assert(usesMv(q), q.queryExecution.optimizedPlan.toString)
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = (0 until 100).groupBy(i => s"c${i % 2}")
      .map { case (c, is) => c -> is.map(_.toLong).sum }
    assert(got == want)
  }

  test("dimension filter is replayed over the MV") {
    val eng = fixture()
    val q = joined(eng).filter(col("seg") === "s1")
      .groupBy(col("seg")).agg(sum(col("v")).as("s_v"))
    assert(usesMv(q), q.queryExecution.optimizedPlan.toString)
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("s1" -> truth()("s1")._1))
  }

  test("non-dimension filter blocks the rewrite (still correct via base)") {
    val eng = fixture()
    val q = joined(eng).filter(col("v") < 50)
      .groupBy(col("seg")).agg(sum(col("v")).as("s_v"))
    assert(!usesMv(q), q.queryExecution.optimizedPlan.toString)
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == truth(_ < 50).map { case (s, t) => s -> t._1 })
  }

  test("non-covered aggregate (min) blocks the rewrite") {
    val eng = fixture()
    val q = joined(eng).groupBy(col("seg")).agg(min(col("v")).as("mn_v"))
    assert(!usesMv(q), q.queryExecution.optimizedPlan.toString)
  }

  test("a load into the FACT disables the rewrite until refresh") {
    val eng = fixture()
    assert(usesMv(bySeg(eng)))
    eng.ingest("db", "fact", spark.createDataFrame(
      Seq(Row(3L, "c1", 1000L)).asJava, factSchema), Some(Version(3, 3)))
    val stale = bySeg(eng)
    assert(!usesMv(stale), stale.queryExecution.optimizedPlan.toString)
    // correct from base: new row joins dim 3 (seg s0)
    val got = stale.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val t = truth()
    assert(got("s0") == (t("s0")._1 + 1000L, 1000L, t("s0")._3 + 1))
    eng.mvs.materialize(mvDef)
    assert(usesMv(bySeg(eng)))
  }

  test("a load into the DIM disables the rewrite until refresh") {
    val eng = fixture()
    assert(usesMv(bySeg(eng)))
    // new dim row: key 10 never joins, but the DIM VERSION moved — the MV
    // can no longer prove itself current, so it must step aside
    eng.ingest("db", "dim", spark.createDataFrame(
      Seq(Row(10L, "s9")).asJava, dimSchema), Some(Version(2, 2)))
    val stale = bySeg(eng)
    assert(!usesMv(stale), stale.queryExecution.optimizedPlan.toString)
    eng.mvs.materialize(mvDef)
    assert(usesMv(bySeg(eng)))
  }

  test("outer join and wrong-key join do not rewrite") {
    val eng = fixture()
    val outer = eng.scan("db", "fact").join(eng.scan("db", "dim"),
      col("fk") === col("dk"), "left")
      .groupBy(col("seg")).agg(sum(col("v")).as("s_v"))
    assert(!usesMv(outer), outer.queryExecution.optimizedPlan.toString)
    val wrongKey = eng.scan("db", "fact").join(eng.scan("db", "dim"),
      col("v") === col("dk"), "inner")
      .groupBy(col("seg")).agg(sum(col("v")).as("s_v"))
    assert(!usesMv(wrongKey), wrongKey.queryExecution.optimizedPlan.toString)
  }

  test("incremental refresh folds the fact delta and re-enables the rewrite") {
    val eng = fixture()
    // two delta rows: fk=3 (seg s0) and fk=4 (seg s1)
    eng.ingest("db", "fact", spark.createDataFrame(
      Seq(Row(3L, "c0", 200L), Row(4L, "c1", 300L)).asJava, factSchema),
      Some(Version(3, 3)))
    assert(!usesMv(bySeg(eng)))
    eng.mvs.refreshIncremental("db", "fact", "by_seg_cat")
    val q = bySeg(eng)
    assert(usesMv(q), q.queryExecution.optimizedPlan.toString)
    val got = q.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val t = truth()
    assert(got("s0") == (t("s0")._1 + 200L, math.max(t("s0")._2, 200L), t("s0")._3 + 1))
    assert(got("s1") == (t("s1")._1 + 300L, math.max(t("s1")._2, 300L), t("s1")._3 + 1))
    assert(got("s2") == t("s2"))
  }

  test("incremental refresh after a DIM move falls back to a full rebuild") {
    val eng = fixture()
    // dim key 10 now exists; fact rows for it arrive in the same refresh window
    eng.ingest("db", "dim", spark.createDataFrame(
      Seq(Row(10L, "s9")).asJava, dimSchema), Some(Version(2, 2)))
    eng.ingest("db", "fact", spark.createDataFrame(
      Seq(Row(10L, "c0", 500L)).asJava, factSchema), Some(Version(3, 3)))
    eng.mvs.refreshIncremental("db", "fact", "by_seg_cat")
    val q = bySeg(eng)
    assert(usesMv(q), q.queryExecution.optimizedPlan.toString)
    val got = q.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("s9") == (500L, 500L, 1L))
    assert(got("s0") == truth()("s0"))
  }

  test("incremental refresh after a fact DELETE WHERE rebuilds — deleted rows leave the MV") {
    val eng = fixture()
    // deletes fact rows already folded into the stored MV: the v3 delete
    // marker is not an append-only delta, so refreshIncremental must fall
    // back to a full rebuild rather than fold an empty delta and re-stamp
    eng.deleteWhere("db", "fact", "v >= 50", Some(Version(3, 3)))
    eng.mvs.refreshIncremental("db", "fact", "by_seg_cat")
    val q = bySeg(eng)
    assert(usesMv(q), q.queryExecution.optimizedPlan.toString)
    val got = q.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == truth(_ < 50))
  }

  test("streaming fact ingest keeps the MV current per micro-batch") {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-mv-stream-wh-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "fact", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("fk", LongType),
        ColumnSpec.value("cat", StringType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("fk"), numBuckets = 2))
    eng.createTable(TableDef(
      db = "db", name = "dim", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("dk", LongType),
        ColumnSpec.value("seg", StringType))),
      bucketColumn = Some("dk"), numBuckets = 2))
    eng.ingest("db", "dim", spark.createDataFrame(
      (0 until 10).map(i => Row(i.toLong, s"s${i % 3}")).asJava, dimSchema),
      Some(Version(1, 1)))
    val srcDir = Files.createTempDirectory("graft-mv-stream-src-")
    val ckpt = Files.createTempDirectory("graft-mv-stream-ckpt-").toString
    def write(rows: Seq[Row]): Unit =
      spark.createDataFrame(rows.asJava, factSchema)
        .coalesce(1).write.mode("append").parquet(srcDir.toString)
    def runStream(): Unit = {
      val stream = spark.readStream.schema(factSchema).parquet(srcDir.toString)
      graft.streaming.StreamIngest.start(eng, "db", "fact", stream, ckpt,
        refreshMvs = Seq("by_seg_cat")).awaitTermination()
    }
    write(Seq(Row(1L, "c0", 10L)))
    eng.mvs.materialize(mvDef)
    runStream()
    assert(eng.mvs.isFresh("db", "fact", "by_seg_cat"))
    write(Seq(Row(2L, "c0", 5L), Row(3L, "c1", 7L)))
    runStream()
    assert(eng.mvs.isFresh("db", "fact", "by_seg_cat"))
    val q = bySeg(eng)
    assert(usesMv(q), q.queryExecution.optimizedPlan.toString)
    val got = q.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // fk 1 -> s1 (10), fk 2 -> s2 (5), fk 3 -> s0 (7)
    assert(got == Map("s1" -> ((10L, 10L, 1L)), "s2" -> ((5L, 5L, 1L)),
      "s0" -> ((7L, 7L, 1L))))
  }

  test("explicit MvManager.aggregate serves from MV when fresh, base when stale") {
    val eng = fixture()
    val fresh = eng.mvs.aggregate("db", "fact", "db", "dim",
      Seq("seg"), Seq(("s_v", "v", AggType.Sum)))
    assert(fresh.inputFiles.exists(_.contains("mvs")))
    eng.ingest("db", "fact", spark.createDataFrame(
      Seq(Row(3L, "c1", 7L)).asJava, factSchema), Some(Version(3, 3)))
    val stale = eng.mvs.aggregate("db", "fact", "db", "dim",
      Seq("seg"), Seq(("s_v", "v", AggType.Sum)))
    assert(!stale.inputFiles.exists(_.contains("mvs")))
    val t = truth()
    val got = stale.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("s0") == t("s0")._1 + 7L)
  }
}
