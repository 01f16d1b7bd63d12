package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog._
import graft.engine.OlapEngine
import graft.model._

/** Rowset-zone-map probe: the measured form of "does pruning rowsets before
  * any I/O matter on a long version history". Builds ONE Duplicate table
  * from `loads` range-disjoint MVCC loads of the events table (the natural
  * time-keyed ingest shape: each load owns a key band), then times a
  * narrow-band aggregate three ways:
  *
  *  - pruned: the filter's band intersects ~1 rowset; RowsetPruneRewrite
  *    collapses every other branch at optimization time (no listing, no
  *    footer, no task);
  *  - unpruned: same plan with the rule's registry cleared — every rowset
  *    is listed, opened, and parquet row-group stats do the filtering;
  *  - full: the unfiltered aggregate (the scan floor).
  *
  * Also reports scan-branch counts as plan evidence. Expectation at scale:
  * pruned latency is FLAT in the number of loads while unpruned grows with
  * them — the same contract FwdProbe pins for delta-sized index updates.
  *
  * Usage: PruneProbe <sfDir> [loads] — prints one JSON line.
  */
object PruneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val loads = if (args.length > 1) args(1).toInt else 48
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", FastTmp.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    val eng = new OlapEngine(spark,
      Files.createTempDirectory(java.nio.file.Paths.get(FastTmp.dir), "prune-probe-"))
    eng.createDatabase("probe")
    eng.createTable(TableDef(
      db = "probe", name = "t",
      schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("event_id", org.apache.spark.sql.types.LongType),
        ColumnSpec.value("user_id", org.apache.spark.sql.types.LongType),
        ColumnSpec.value("value", org.apache.spark.sql.types.DoubleType))),
      bucketColumn = Some("event_id"), numBuckets = 4))
    val ev = graft.queries.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val maxId = ev.agg(max(col("event_id"))).head.getLong(0) + 1
    val band = math.max(1L, maxId / loads)
    (0 until loads).foreach { i =>
      eng.ingest("probe", "t",
        ev.filter(col("event_id") >= i * band &&
          (if (i == loads - 1) lit(true) else col("event_id") < (i + 1) * band)))
    }

    // the probe band: one load's range, mid-table
    val lo = (loads / 2) * band
    val hi = lo + band / 2
    def query = eng.scan("probe", "t")
      .filter(col("event_id") >= lo && col("event_id") < hi)
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("s"))
    def full = eng.scan("probe", "t")
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("s"))

    def scansIn(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.size

    def median3(work: => Unit): Double = {
      work // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }

    val prunedScans = scansIn(query)
    val pruned = median3(query.write.mode("overwrite").format("noop").save())
    val fullSec = median3(full.write.mode("overwrite").format("noop").save())
    // disarm the rule (clear() is not enough: the read path re-registers at
    // DataFrame construction): same query, every branch survives to execution
    graft.plans.RowsetPruneRewrite.setEnabled(false)
    val (unprunedScans, unpruned) =
      try (scansIn(query),
        median3(query.write.mode("overwrite").format("noop").save()))
      finally graft.plans.RowsetPruneRewrite.setEnabled(true)

    // --- bloom tier: INTERLEAVED loads (every load spans the full id range,
    // zone maps useless by construction) + a declared bloom column; a point
    // lookup must drop every rowset whose sidecar excludes the key
    eng.createTable(TableDef(
      db = "probe", name = "b",
      schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("event_id", org.apache.spark.sql.types.LongType),
        ColumnSpec.value("user_id", org.apache.spark.sql.types.LongType),
        ColumnSpec.value("value", org.apache.spark.sql.types.DoubleType))),
      bucketColumn = Some("event_id"), numBuckets = 4,
      bloomColumns = Seq("event_id")))
    (0 until loads).foreach { i =>
      eng.ingest("probe", "b", ev.filter(col("event_id") % loads === i))
    }
    val probeKey = (maxId - 1) - ((maxId - 1) % loads) // lives in load 0
    def point = eng.scan("probe", "b")
      .filter(col("event_id") === probeKey)
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("s"))
    val bloomScans = scansIn(point)
    val bloomSec = median3(point.write.mode("overwrite").format("noop").save())
    graft.plans.RowsetPruneRewrite.setEnabled(false)
    val (noBloomScans, noBloomSec) =
      try (scansIn(point),
        median3(point.write.mode("overwrite").format("noop").save()))
      finally graft.plans.RowsetPruneRewrite.setEnabled(true)

    // --- NGRAM tier: same interleaved shape, but the probe is SUBSTRING
    // containment (LIKE '%needle%') on a string column — which no zone map
    // can refute (containment is orderless) and no equality bloom can see.
    // The per-load marker rides MID-string; the needle's trigrams exist in
    // exactly one load's sidecar.
    eng.createTable(TableDef(
      db = "probe", name = "n",
      schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("event_id", org.apache.spark.sql.types.LongType),
        ColumnSpec.value("tag", org.apache.spark.sql.types.StringType),
        ColumnSpec.value("value", org.apache.spark.sql.types.DoubleType))),
      bucketColumn = Some("event_id"), numBuckets = 4,
      ngramBloomColumns = Seq("tag")))
    (0 until loads).foreach { i =>
      eng.ingest("probe", "n", ev.filter(col("event_id") % loads === i)
        .select(col("event_id"),
          concat(col("event_id").cast("string"), lit(s"qq${i}zz")).as("tag"),
          col("value")))
    }
    val needle = s"qq${loads / 2}zz" // exists only in load loads/2
    def sub = eng.scan("probe", "n")
      .filter(col("tag").contains(needle))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("s"))
    val ngramScans = scansIn(sub)
    val ngramSec = median3(sub.write.mode("overwrite").format("noop").save())
    graft.plans.RowsetPruneRewrite.setEnabled(false)
    val (noNgramScans, noNgramSec) =
      try (scansIn(sub),
        median3(sub.write.mode("overwrite").format("noop").save()))
      finally graft.plans.RowsetPruneRewrite.setEnabled(true)

    // --- MERGE-ON-WRITE tier: the same banded loads into a Unique table,
    // once with merge-on-write (key-disjoint keyUnique rowsets → the scan
    // serves as a plain union) and once plain (merge-on-read pays a key
    // shuffle + hash aggregate on EVERY read). Measures the read-time cost
    // the write-time merge buys back; `*_scan_aggs` is the plan evidence.
    def mkUnique(name: String, mow: Boolean): Unit = {
      eng.createTable(TableDef(
        db = "probe", name = name,
        schema = TableSchema(KeysType.Unique, Seq(
          ColumnSpec.key("event_id", org.apache.spark.sql.types.LongType),
          ColumnSpec.value("user_id", org.apache.spark.sql.types.LongType),
          ColumnSpec.value("value", org.apache.spark.sql.types.DoubleType))),
        bucketColumn = Some("event_id"), numBuckets = 4, mergeOnWrite = mow))
      (0 until loads).foreach { i =>
        eng.ingest("probe", name,
          ev.filter(col("event_id") >= i * band &&
            (if (i == loads - 1) lit(true) else col("event_id") < (i + 1) * band)))
      }
    }
    mkUnique("m", mow = true)
    mkUnique("p", mow = false)
    def uniqueAggs(t: String): Int =
      eng.scan("probe", t).queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.size
    def uniqueDigest(t: String) = eng.scan("probe", t)
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("s"))
    val mowAggs = uniqueAggs("m")
    val plainAggs = uniqueAggs("p")
    val mowSec = median3(
      uniqueDigest("m").write.mode("overwrite").format("noop").save())
    val plainSec = median3(
      uniqueDigest("p").write.mode("overwrite").format("noop").save())

    // --- DICT tier: the metadata GROUP BY serve (value-histogram sidecars,
    // StatsAggRewrite's grouped path). Interleaved loads with a
    // low-cardinality class column; the grouped count serves from the
    // driver-side histogram fold — ZERO relations in the plan — while the
    // rule-off form scans and shuffles every load. Expectation: served
    // latency is flat in the number of loads (O(loads) tiny sidecar reads,
    // cached after the first fold); the scan grows with data volume.
    eng.createTable(TableDef(
      db = "probe", name = "d",
      schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("event_id", org.apache.spark.sql.types.LongType),
        ColumnSpec.value("cls", org.apache.spark.sql.types.StringType),
        ColumnSpec.value("value", org.apache.spark.sql.types.DoubleType))),
      bucketColumn = Some("event_id"), numBuckets = 4,
      dictStatsColumns = Seq("cls")))
    (0 until loads).foreach { i =>
      eng.ingest("probe", "d", ev.filter(col("event_id") % loads === i)
        .select(col("event_id"),
          concat(lit("c"), (col("event_id") % 16).cast("string")).as("cls"),
          col("value")))
    }
    def grp = eng.scan("probe", "d").groupBy(col("cls"))
      .agg(count(lit(1)).as("n"), count(col("cls")).as("nt"))
    val dictScans = scansIn(grp)
    val dictSec = median3(grp.write.mode("overwrite").format("noop").save())
    graft.plans.StatsAggRewrite.setEnabled(false)
    val (noDictScans, noDictSec) =
      try (scansIn(grp),
        median3(grp.write.mode("overwrite").format("noop").save()))
      finally graft.plans.StatsAggRewrite.setEnabled(true)

    println(s"""{"loads":$loads,"pruned_scan_branches":$prunedScans,""" +
      s""""unpruned_scan_branches":$unprunedScans,""" +
      s""""pruned_sec":${f"$pruned%.3f"},"unpruned_sec":${f"$unpruned%.3f"},""" +
      s""""full_scan_sec":${f"$fullSec%.3f"},""" +
      s""""bloom_scan_branches":$bloomScans,"no_bloom_scan_branches":$noBloomScans,""" +
      s""""bloom_point_sec":${f"$bloomSec%.3f"},"no_bloom_point_sec":${f"$noBloomSec%.3f"},""" +
      s""""ngram_scan_branches":$ngramScans,"no_ngram_scan_branches":$noNgramScans,""" +
      s""""ngram_sub_sec":${f"$ngramSec%.3f"},"no_ngram_sub_sec":${f"$noNgramSec%.3f"},""" +
      s""""mow_scan_aggs":$mowAggs,"plain_scan_aggs":$plainAggs,""" +
      s""""mow_scan_sec":${f"$mowSec%.3f"},"plain_scan_sec":${f"$plainSec%.3f"},""" +
      s""""dict_scan_branches":$dictScans,"no_dict_scan_branches":$noDictScans,""" +
      s""""dict_group_sec":${f"$dictSec%.3f"},"no_dict_group_sec":${f"$noDictSec%.3f"}}""")
    spark.stop()
  }
}
