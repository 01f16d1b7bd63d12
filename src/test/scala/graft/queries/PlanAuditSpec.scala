package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkTestSession}

/** Physical-plan audit: the scale properties the engine depends on, asserted
  * as tests instead of frozen doc captures. Each one is a property that
  * silently regressing would make a 100 TB run slow while every correctness
  * check stays green — exactly the failure mode worth a living guard:
  * column pruning reaching the scan, predicate pushdown reaching parquet
  * stats, small dimensions broadcast (no shuffled fact), bucketed joins not
  * shuffling, top-k cut before the shuffle, global top-k never sorting the
  * world, and map-side partial aggregation.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q01: column pruning — scan reads exactly the 3 projected columns") {
    val p = plan("q01_scan_project")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), p)
  }

  test("q02: predicate pushdown — filters reach the parquet scan") {
    val p = SparkEntry.queries("q02_filter_scan")(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("LessThan(l_quantity,24.0)"), p)
  }

  test("q03: aggregation is partial+final (map-side combine before shuffle)") {
    val p = plan("q03_agg_q1")
    assert(p.contains("partial_sum"), p)
  }

  test("q05: small dimension broadcasts — fact side never shuffles for the join") {
    val p = plan("q05_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q46: bucketed co-located join — no shuffle exchange at all") {
    val p = plan("q46_bucketed_join")
    assert(p.contains("Bucketed: true"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q12: global top-k uses TakeOrderedAndProject (never a full sort)") {
    val p = plan("q12_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q97: per-group first-row cut happens BEFORE the shuffle (WindowGroupLimit)") {
    val p = plan("q97_keep_first")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.indexOf("WindowGroupLimit") > p.indexOf("Window "), p) // partial mode below final
  }

  test("q25: partition pruning — only the requested hive partition is scanned") {
    val p = plan("q25_engine_partition_prune")
    assert(p.contains("__graft_part"), p)
    // a partition filter at the scan, not a post-scan row filter
    assert(p.contains("PartitionFilters: [isnotnull(__graft_part") ||
      p.contains("PartitionFilters: [(__graft_part") ||
      p.contains("PartitionFilters: [__graft_part"), p)
  }

  test("q34: ANN probes broadcast — corpus side is never shuffled") {
    val p = plan("q34_ann_brute_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q188: expired partitions prune as DIRECTORIES (PartitionFilters at " +
    "the scan), not scan-then-filter — retired data costs zero read I/O") {
    val p = SparkEntry.queries("q188_partition_expiry")(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // each of the 9 expiry markers becomes a partition-column exclusion in
    // PartitionFilters; the version guard constant-folds away entirely
    assert(p.contains("PartitionFilters:") && p.contains("NOT (__graft_part"), p)
    assert(p.contains("= p0)"), p)
    // no residual row filter evaluates the date-range mask
    assert(!p.contains("coalesce(((cast(o_orderdate"), p)
  }

  test("q187: the table-served ANN probe broadcasts cells and LUTs; the only " +
    "shuffle join is the corpus-sized vec_id equi-join") {
    val eng = graft.pipeline.AnnIndex.engineFor(spark, dir)
    val p = graft.pipeline.AnnIndex
      .topKFromTable(eng, spark.read.parquet(s"$dir/embeddings.parquet"))
      .queryExecution.executedPlan.toString
    // probe-cell routing + LUT attach are broadcast (model-sized sides)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q127: delete mask constant-folds away for rowsets newer than the delete") {
    import org.apache.spark.sql.execution.FilterExec
    val exec = SparkEntry.queries("q127_delete_where")(spark, dir)
      .queryExecution.executedPlan
    // fixture: rowset v1 (pre-delete, masked) + rowset v3 (post-delete,
    // untouched) — exactly ONE branch carries the delete filter
    val maskFilters = exec.collect {
      case f: FilterExec if f.condition.toString.toLowerCase.contains("coalesce") => f
    }
    assert(maskFilters.size == 1, exec.toString)
  }

  test("q129: window_funnel is one shuffle — no joins, no window sort") {
    val p = plan("q129_window_funnel")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("WindowExec"), p)
  }

  test("q30: exact dedup shuffles md5 fingerprints, never the document text") {
    val p = plan("q30_dedup_exact")
    // the exchange partitions on the fingerprint; the full text column stays
    // map-side (hashed in the scan stage) — at 100 TB the difference between
    // shuffling 48 bytes/doc and shuffling the corpus
    assert(p.contains("hashpartitioning(__fp"), p)
    assert(!p.contains("hashpartitioning(text"), p)
  }

  test("q169: CMS matrix is partial-aggregated and BROADCAST to the probe join") {
    val p = plan("q169_count_min")
    // the d×w matrix build must combine map-side (the shuffle-caps-at-d·w
    // guarantee) and the finished matrix must broadcast, never shuffle the
    // probe side against it
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q177: grouped OLS is ONE aggregate — no join, no window, no extra exchange") {
    val p = plan("q177_group_ols")
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("WindowExec"), p)
    // exactly one shuffle: the grouped sufficient-statistics exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q180: random projection is a pure map — zero exchanges of any kind") {
    val p = plan("q180_random_projection")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }

  test("q182: the index SERVE never re-runs the closure — parquet scans and " +
    "joins only, no materialized-RDD stage from the CC loop") {
    // connectedComponents materializes each round via localCheckpoint, which
    // surfaces in a consuming plan as 'Scan ExistingRDD'. The serve path
    // must read the MAINTAINED table instead — its plan may scan parquet and
    // join, but an ExistingRDD scan means the closure leaked back into the
    // per-query path (the exact regression q182 exists to prevent).
    val p = plan("q182_split_from_cluster_index")
    assert(!p.contains("ExistingRDD"), p)
    assert(p.contains("Scan parquet"), p)
  }
}
