package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.engine.OlapEngine

/** The incrementally-maintained cluster_reps index must equal a full CC
  * recompute after every delta fold — including the two cases a naive
  * best-match incremental screen gets wrong: a delta doc BRIDGING two
  * existing clusters (they must merge), and a delta doc whose id undercuts
  * the stored rep (the component min must be re-elected cluster-wide).
  */
class ClusterRepsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // All docs share a 20-char prefix block ("xx yy zz qq ww eeeeee " is 22
  // chars), so pairing is decided purely by word-set Jaccard: 6 shared
  // prefix words + 12 tail words each ⇒ cross-cluster pairs sit at
  // 6/30 = 0.2 < 0.3 and within-cluster pairs well above.
  private val P = "xx yy zz qq ww eeeeee "
  private def tail(c: String, n: Int = 12) = (1 to n).map(c + _).mkString(" ")

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val corpus = df(Seq(
    1L -> (P + tail("a")),                                  // cluster A
    2L -> (P + tail("a", 11) + " xa12"),                    // cluster A
    3L -> (P + tail("b")),                                  // cluster B
    4L -> (P + tail("b", 11) + " yb12"),                    // cluster B
    5L -> (P + tail("c"))))                                 // singleton
  // delta: 0 bridges A and B (6 a-words + 6 b-words) AND undercuts both
  // reps; 20 matches nothing; 21 pulls the corpus singleton 5 into a cluster
  private val delta = df(Seq(
    0L -> (P + (1 to 6).map("a" + _).mkString(" ") + " " +
      (1 to 6).map("b" + _).mkString(" ")),
    20L -> (P + tail("d")),
    21L -> (P + tail("c", 11) + " zc12")))
  private val allDocs = corpus.unionByName(delta)

  private def mkEngine(): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-creps-wh-"))
    ClusterReps.createIndexTable(eng)
    eng
  }

  private def stored(eng: OlapEngine): Set[(Long, Long)] =
    eng.scan(ClusterReps.Db, ClusterReps.Table)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def fullCC(docs: DataFrame): Set[(Long, Long)] =
    Dedup.connectedComponents(Dedup.ngramJaccardOf(docs), "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bootstrap stores the corpus-only closure (sparse: singletons absent)") {
    val eng = mkEngine()
    ClusterReps.bootstrap(eng, corpus)
    assert(stored(eng) === Set((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)))
  }

  test("delta fold ≡ full recompute: bridge merges clusters, rep re-elected, " +
    "singleton pulled in, no-match delta stays out") {
    val eng = mkEngine()
    ClusterReps.bootstrap(eng, corpus)
    ClusterReps.applyDelta(eng, delta)
    val expected = fullCC(allDocs)
    // the mini-corpus exercises every path: {0,1,2,3,4}→0 (bridge + new
    // min), {5,21}→5 (stored row for a previously-unstored corpus doc),
    // 20 absent (no-edge delta doc)
    assert(expected === Set((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L),
      (5L, 5L), (21L, 5L)))
    assert(stored(eng) === expected)
  }

  test("re-applying the same delta is a no-op (upserts rewrite identical rows)") {
    val eng = mkEngine()
    ClusterReps.bootstrap(eng, corpus)
    ClusterReps.applyDelta(eng, delta)
    val before = stored(eng)
    ClusterReps.applyDelta(eng, delta)
    assert(stored(eng) === before)
  }

  test("edge-free delta leaves the table untouched (empty small-CC path)") {
    val eng = mkEngine()
    ClusterReps.bootstrap(eng, corpus)
    val before = stored(eng)
    ClusterReps.applyDelta(eng, df(Seq(30L -> (P + tail("e")))))
    assert(stored(eng) === before)
  }

  test("compaction folds the bootstrap + delta rowsets without changing the " +
    "served mapping (the index stays read-efficient as folds accumulate)") {
    val eng = mkEngine()
    ClusterReps.bootstrap(eng, corpus)
    ClusterReps.applyDelta(eng, delta)
    val before = stored(eng)
    eng.compact(ClusterReps.Db, ClusterReps.Table)
    eng.gc(ClusterReps.Db, ClusterReps.Table)
    assert(stored(eng) === before)
    // and further folds keep working against the compacted base
    ClusterReps.applyDelta(eng, df(Seq(40L -> (P + tail("c", 11) + " wc12"))))
    assert(stored(eng) === before + ((40L, 5L)))
  }

  test("property: maintained index ≡ full CC for random corpora and random " +
    "corpus/delta splits (5 seeded trials)") {
    // random cluster structure: nc clusters × up to 4 members (each member
    // mutates up to 2 tail positions — within-cluster Jaccard ≥ ~0.57,
    // cross-cluster 0.2 < 0.3), plus unique-tail singletons; every doc is
    // randomly assigned corpus or delta, so the trials cover delta-bridges,
    // delta-only clusters, rep displacement and empty-ish deltas by chance.
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      var id = -1L
      def nextId(): Long = { id += 1; id }
      val docsRows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      val nc = 2 + rnd.nextInt(3)
      for (c <- 0 until nc; _ <- 0 until (2 + rnd.nextInt(3))) {
        val base = (1 to 12).map(j => s"c${c}w$j").toArray
        val muts = rnd.nextInt(3)
        for (_ <- 0 until muts)
          base(rnd.nextInt(12)) = s"noise${rnd.nextInt(100000)}"
        docsRows += nextId() -> (P + base.mkString(" "))
      }
      for (s <- 0 until rnd.nextInt(4))
        docsRows += nextId() -> (P + (1 to 12).map(j => s"solo${seed}x${s}w$j").mkString(" "))
      val all = df(docsRows.toSeq)
      val corpusR = df(docsRows.filter(_ => rnd.nextBoolean()).toSeq match {
        case s if s.nonEmpty => s
        case _               => docsRows.take(1).toSeq
      })
      val corpusIds = corpusR.collect().map(_.getLong(0)).toSet
      val deltaR = df(docsRows.filterNot(r => corpusIds(r._1)).toSeq)

      val eng = mkEngine()
      ClusterReps.bootstrap(eng, corpusR)
      ClusterReps.applyDelta(eng, deltaR)
      assert(stored(eng) === fullCC(all), s"divergence at seed=$seed")
    }
  }

  test("property: k SEQUENTIAL delta folds ≡ full CC (k ∈ {2,3}, 5 seeded " +
    "trials each) — each fold screens against the accumulated corpus") {
    // production folds deltas forever; the single-delta property can't see
    // a bug where batch i never pairs with batch j>i. Same random cluster
    // generator, but docs are dealt across bootstrap + k delta batches; the
    // screen side is the ENGINE's own absorbed-corpus table, so each fold
    // passes only its batch (the round-9 self-sourced contract).
    for (k <- Seq(2, 3); seed <- 1 to 5) {
      val rnd = new scala.util.Random(100 * k + seed)
      var id = -1L
      def nextId(): Long = { id += 1; id }
      val docsRows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      val nc = 2 + rnd.nextInt(3)
      for (c <- 0 until nc; _ <- 0 until (2 + rnd.nextInt(4))) {
        val base = (1 to 12).map(j => s"c${c}w$j").toArray
        for (_ <- 0 until rnd.nextInt(3))
          base(rnd.nextInt(12)) = s"noise${rnd.nextInt(100000)}"
        docsRows += nextId() -> (P + base.mkString(" "))
      }
      for (s <- 0 until rnd.nextInt(4))
        docsRows += nextId() -> (P + (1 to 12).map(j => s"solo${k}x${seed}x${s}w$j").mkString(" "))
      // deal each doc into batch 0 (bootstrap) .. k (delta k); batches may
      // be empty — the empty-delta path is part of the contract
      val batches = Array.fill(k + 1)(scala.collection.mutable.ArrayBuffer.empty[(Long, String)])
      docsRows.foreach(r => batches(rnd.nextInt(k + 1)) += r)
      if (batches(0).isEmpty) batches(0) += docsRows.head

      val eng = mkEngine()
      var absorbed = batches(0).toSeq.distinct
      ClusterReps.bootstrap(eng, df(absorbed))
      for (b <- 1 to k) {
        val deltaRows = batches(b).toSeq.filterNot(absorbed.contains)
        if (deltaRows.nonEmpty) {
          ClusterReps.applyDelta(eng, df(deltaRows))
          absorbed = absorbed ++ deltaRows
        }
      }
      assert(stored(eng) === fullCC(df(docsRows.toSeq)),
        s"divergence at k=$k seed=$seed")
    }
  }

  test("rep-displacement chain across folds: each delta's smaller id takes " +
    "over as rep, cluster-wide, fold after fold") {
    // cluster starts as {10, 11}; delta 1 adds 5 (new min), delta 2 adds 2
    // (newer min). After each fold EVERY member must point at the new min —
    // the chain re-election the star-edge quotient argument promises.
    val d10 = df(Seq(10L -> (P + tail("a")), 11L -> (P + tail("a", 11) + " xa12")))
    val eng = mkEngine()
    ClusterReps.bootstrap(eng, d10)
    assert(stored(eng) === Set((10L, 10L), (11L, 10L)))
    val d5 = df(Seq(5L -> (P + tail("a"))))
    ClusterReps.applyDelta(eng, d5)
    assert(stored(eng) === Set((5L, 5L), (10L, 5L), (11L, 5L)))
    val d2 = df(Seq(2L -> (P + tail("a", 11) + " xa12")))
    ClusterReps.applyDelta(eng, d2)
    assert(stored(eng) === Set((2L, 2L), (5L, 2L), (10L, 2L), (11L, 2L)))
  }

  test("broadcast-gate fallback: a delta above the broadcast ceiling folds " +
    "through the shuffle-join path to the identical index") {
    val engB = mkEngine()
    ClusterReps.bootstrap(engB, corpus)
    ClusterReps.applyDelta(engB, delta) // broadcast path (default gate)
    val engS = mkEngine()
    ClusterReps.bootstrap(engS, corpus)
    ClusterReps.applyDelta(engS, delta, maxBroadcastRows = 0L) // forced fallback
    assert(stored(engS) === stored(engB))
  }

  test("split served from the maintained index equals the one-shot q178 split") {
    val eng = mkEngine()
    ClusterReps.bootstrap(eng, corpus)
    ClusterReps.applyDelta(eng, delta)
    val reps = eng.scan(ClusterReps.Db, ClusterReps.Table)
      .select(col("doc_id"), col("rep").as("stored"))
    val served = Dedup.splitOfReps(
      allDocs.select(col("doc_id")).join(reps, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("stored"), col("doc_id")).as("rep")))
    val oneShot = Dedup.splitOfReps(
      allDocs.select(col("doc_id"))
        .join(Dedup.connectedComponents(Dedup.ngramJaccardOf(allDocs),
          "doc_a", "doc_b"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("survivor_id"), col("doc_id")).as("rep")))
    assert(served.collect().toSet === oneShot.collect().toSet)
  }

  test("scheduled compaction after fold bursts is answer-neutral on the " +
    "reps table and collapses it to one rowset") {
    val eng = mkEngine()
    ClusterReps.bootstrap(eng, corpus)
    ClusterReps.applyDelta(eng, delta)
    // replay-safe re-folds pile up rowset fragments without changing content
    ClusterReps.applyDelta(eng, delta)
    ClusterReps.applyDelta(eng, delta)
    val before = stored(eng)
    assert(eng.manifest(ClusterReps.Db, ClusterReps.Table).compactionScore >= 3.0)
    val compacted = eng.runScheduledCompaction()
    assert(compacted.contains(s"${ClusterReps.Db}.${ClusterReps.Table}"))
    assert(stored(eng) === before, "compaction must not change the mappings")
    assert(eng.manifest(ClusterReps.Db, ClusterReps.Table)
      .visibleRowsets.count(!_.isDeleteMarker) == 1)
  }
}
