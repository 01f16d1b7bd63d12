package graft.engine

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.model._

/** The warehouse is SELF-DESCRIBING: opening an engine over an existing
  * warehouse restores the catalog (no DDL replay), re-arms the prune rules
  * (incl. the rebucket layout floor) and re-registers rollup/MV rewrite
  * entries (no re-materialize). Every test "restarts" by COPYING the
  * warehouse to a fresh path first — the rewrite registries are JVM-global
  * and keyed by path, so a same-path reopen could serve from the FIRST
  * engine's registrations and mask a broken reload; a copied path can only
  * serve if the on-disk state carries everything.
  */
class WarehouseRestartSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def copyDir(src: Path, dst: Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(src).iterator().asScala.foreach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t); () }
    }
  }

  private def restarted(eng: OlapEngine): OlapEngine = {
    val dst = Files.createTempDirectory("graft-restart-")
    copyDir(eng.warehouse, dst)
    new OlapEngine(spark, dst)
  }

  /** Files actually selected by every parquet scan in the executed plan
    * (descending into AQE query stages — BucketPruneSpec's idiom).
    */
  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    df.collect() // finalize AQE
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = (p match {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case r: ReusedExchangeExec => scans(r.child)
      case _ => Nil
    }) ++ p.children.flatMap(scans)
    scans(df.queryExecution.executedPlan)
      .map(_.selectedPartitions.totalNumberOfFiles).sum
  }

  private def kv(pairs: (Long, Long, String)*) = {
    import spark.implicits._
    pairs.toDF("k", "v", "d")
  }

  private def mkEngine(): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-wrs-"))
    eng.createDatabase("w")
    eng.createTable(TableDef(
      db = "w", name = "fact",
      schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", LongType),
        ColumnSpec.value("d", StringType))),
      policy = PartitionPolicy.Range, partitionColumn = Some("d"),
      partitions = Seq(
        PartitionSpec("p0", Some("2000-06-01"), numBuckets = 2),
        PartitionSpec("p1", Some(RangeBound.MaxValue), numBuckets = 2)),
      bucketColumn = Some("k"), numBuckets = 2))
    eng.ingest("w", "fact",
      kv((0L until 40L).map(i => (i, i * 10, if (i % 2 == 0) "2000-01-01" else "2000-12-01")): _*))
    eng
  }

  test("catalog survives: a fresh engine over a COPIED warehouse scans with " +
    "no DDL replay, and the restored TableDef is the evolved one") {
    val eng = mkEngine()
    eng.renameColumn("w", "fact", "v", "amount")
    val eng2 = restarted(eng)
    assert(eng2.catalog.getTable("w", "fact").isDefined)
    assert(eng2.catalog.getTable("w", "fact").get.renamedColumns === Map("v" -> "amount"))
    assert(eng2.scan("w", "fact").agg(sum(col("amount"))).head().getLong(0)
      === (0L until 40L).map(_ * 10).sum)
    // transparent bucket pruning is re-armed: a point lookup reads fewer
    // leaf files than the full scan
    graft.GraftExtensions.register(spark)
    val all = filesRead(eng2.scan("w", "fact"))
    val point = filesRead(eng2.scan("w", "fact").filter(col("k") === 7L))
    assert(point < all, s"bucket prune not re-armed: $point vs $all files")
  }

  test("rollup registration survives: the restarted engine serves the " +
    "aggregate FROM THE ROLLUP with zero re-materialization") {
    val eng = mkEngine()
    eng.rollups.materialize("w", "fact", RollupDef(
      name = "by_d", groupCols = Seq("d"),
      aggs = Seq(("s_v", "v", AggType.Sum)), countCol = Some("n")))
    val storedDirs = Files.list(
      eng.tableRoot("w", "fact").resolve("rollups").resolve("by_d")).count()
    val eng2 = restarted(eng)
    assert(eng2.rollups.isFresh("w", "fact", "by_d"),
      "the persisted registration must reload as fresh")
    graft.GraftExtensions.register(spark)
    val q = eng2.scan("w", "fact").groupBy(col("d"))
      .agg(sum(col("v")).as("s_v"), count(lit(1)).as("n"))
    val leaves = q.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten
    assert(leaves.exists(_.contains("rollups/by_d/")),
      s"restarted engine must serve from the reloaded rollup; read: ${leaves.mkString(", ")}")
    // and it answered without building anything new
    assert(Files.list(eng2.tableRoot("w", "fact").resolve("rollups")
      .resolve("by_d")).count() === storedDirs)
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toMap ===
      Map("2000-01-01" -> (0L until 40L by 2).map(_ * 10).sum,
        "2000-12-01" -> (1L until 40L by 2).map(_ * 10).sum))
  }

  test("MV registration survives: the restarted engine serves the join " +
    "aggregate from the MV parquet") {
    import spark.implicits._
    val eng = mkEngine()
    eng.createTable(TableDef(
      db = "w", name = "dim",
      schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("dk", LongType),
        ColumnSpec.value("seg", StringType))),
      bucketColumn = Some("dk"), numBuckets = 2))
    eng.ingest("w", "dim",
      (0L until 40L).map(i => (i, s"seg${i % 3}")).toDF("dk", "seg"))
    eng.mvs.materialize(MvJoinDef(
      name = "by_seg", factDb = "w", factTable = "fact",
      dimDb = "w", dimTable = "dim", factKey = "k", dimKey = "dk",
      groupCols = Seq("seg"), aggs = Seq(("s_v", "v", AggType.Sum)),
      countCol = Some("n")))
    val eng2 = restarted(eng)
    assert(eng2.mvs.isFresh("w", "fact", "by_seg"))
    graft.GraftExtensions.register(spark)
    val q = eng2.scan("w", "fact")
      .join(eng2.scan("w", "dim"), col("k") === col("dk"))
      .groupBy(col("seg")).agg(sum(col("v")).as("s_v"))
    val leaves = q.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten
    assert(leaves.exists(_.contains("mvs/by_seg/")),
      s"restarted engine must serve from the reloaded MV; read: ${leaves.mkString(", ")}")
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toMap ===
      (0L until 40L).groupBy(i => s"seg${i % 3}").view.mapValues(_.map(_ * 10).sum).toMap)
  }

  test("rebucket layout floor survives the restart: the re-armed prune rule " +
    "still never prunes pre-rebucket rowsets (time travel stays correct)") {
    val eng = mkEngine()
    val headBefore = eng.manifest("w", "fact").maxVersion
    eng.rebucket("w", "fact", 5)
    assert(eng.catalog.getTable("w", "fact").get.bucketLayoutFloor > 0L)
    val eng2 = restarted(eng)
    assert(eng2.catalog.getTable("w", "fact").get.bucketLayoutFloor ===
      eng.catalog.getTable("w", "fact").get.bucketLayoutFloor)
    graft.GraftExtensions.register(spark)
    // a point lookup AGAINST THE PRE-REBUCKET SNAPSHOT must still find its
    // row: the old rowset's dirs use the old layout, so pruning them with
    // the new routing would silently drop it — the persisted floor forbids it
    val old = eng2.snapshot("w", "fact", 0L, headBefore).filter(col("k") === 7L)
    assert(old.count() === 1L)
    // and a HEAD point lookup still prunes (the new layout's rowset is
    // above the floor)
    assert(filesRead(eng2.scan("w", "fact").filter(col("k") === 7L)) <
      filesRead(eng2.scan("w", "fact")))
  }
}
