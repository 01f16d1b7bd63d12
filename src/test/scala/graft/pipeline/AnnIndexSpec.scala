package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.engine.OlapEngine

/** The maintained IVF-PQ engine-table index: fold-vs-fit equality (the
  * incremental path reproduces the model's own assignments), incremental
  * fold correctness on held-out vectors, table shape invariants, and the
  * served recall contract on the real corpus.
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // deterministic synthetic corpus: 4 well-separated direction clusters in
  // 16 dims, 20 vectors each — small enough for fast k-means, structured
  // enough that nearest-centroid assignment is unambiguous
  private def synth(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map { id =>
      val cl = (id % 4).toInt
      val rnd = new scala.util.Random(id)
      val base = Array.tabulate(16)(j => if (j / 4 == cl) 1.0 else 0.05)
      (id, base.map(x => (x + rnd.nextDouble() * 0.05).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def mkEngine(): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-annspec-wh-"))
    AnnIndex.createTables(eng)
    eng
  }

  private def stored(eng: OlapEngine): Map[Long, (Int, Seq[Int])] =
    eng.scan(AnnIndex.Db, AnnIndex.AssignTable).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2)))).toMap

  test("bootstrap writes one assignment per vector, codes of length m, " +
    "cells within range; centroid/book tables are model-sized") {
    val eng = mkEngine()
    bootstrapSmall(eng, synth(0L until 80L))
    val a = stored(eng)
    assert(a.size == 80)
    assert(a.values.forall { case (cell, codes) =>
      cell >= 0 && cell < 4 && codes.size == 4 && codes.forall(c => c >= 0 && c < 4)
    })
    assert(eng.scan(AnnIndex.Db, AnnIndex.CentroidTable).count() == 4)
    assert(eng.scan(AnnIndex.Db, AnnIndex.BookTable).count() == 16)
  }

  private def bootstrapSmall(eng: OlapEngine, emb: DataFrame): Unit =
    AnnIndex.bootstrap(eng, emb, nCells = 4, m = 4, kSub = 4)

  test("fold ≡ fit: re-folding vectors the bootstrap already indexed is a " +
    "bit-for-bit no-op (fit and fold publish through the ONE shared argmin " +
    "formula, so agreement is structural, ties included)") {
    val eng = mkEngine()
    val emb = synth(0L until 80L)
    bootstrapSmall(eng, emb)
    val before = stored(eng)
    AnnIndex.applyDelta(eng, emb) // every row re-assigned through the fold path
    assert(stored(eng) === before)
  }

  test("incremental fold: held-out vectors land in the cluster-consistent " +
    "cell with in-range codes, and bootstrap rows are untouched") {
    val eng = mkEngine()
    val boot = synth(0L until 80L)
    bootstrapSmall(eng, boot)
    val before = stored(eng)
    // held-out ids continue the same 4-direction structure
    AnnIndex.applyDelta(eng, synth(100L until 120L))
    val after = stored(eng)
    assert(after.size == 100)
    assert(before.forall { case (id, v) => after(id) == v }, "bootstrap rows changed")
    // cluster consistency: a delta vector of direction d must share its cell
    // with the bootstrap vectors of direction d (the clusters are separated
    // enough that nearest-centroid is unambiguous)
    val cellOfDir = (0L until 80L).groupBy(_ % 4)
      .map { case (d, ids) => d -> ids.map(after(_)._1).groupBy(identity).maxBy(_._2.size)._1 }
    (100L until 120L).foreach { id =>
      assert(after(id)._1 == cellOfDir(id % 4), s"delta vec $id in wrong cell")
    }
  }

  test("serve-from-table on the real corpus: recall contract holds and the " +
    "audit row is the oracle-pinned verdict") {
    val dir = "/root/testdata/sf0.001"
    val row = AnnIndex.recallAuditServed(spark, dir).collect().head
    assert(row.getAs[Boolean]("ok"), "table-served IVF-PQ recall below 0.6 floor")
    assert(row.getAs[Boolean]("margin_ok"), "recall below floor + 0.1 margin")
  }

  test("filtered serve (q202): every result satisfies the predicate, and " +
    "with exhaustive routing + a pool-covering rerank the served set equals " +
    "the exact filtered top-k") {
    val dir = "/root/testdata/sf0.001"
    val served = AnnIndex.filteredAnnServed(spark, dir).collect()
    val lbl = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(served.nonEmpty)
    assert(served.forall(r => lbl(r.getAs[Long]("neighbor_id")) == 3),
      "a served neighbor violates the label filter")
    // nprobe = NCells routes everywhere and rerank (50) covers the whole
    // ~10% candidate class, so the only remaining approximation is PQ's ADC
    // pre-rank — which the exact rerank then undoes: sets must match
    val exact = Similarity.bruteForceTopKFiltered(spark, dir)
      .select(col("probe_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = served.map(r =>
      (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(got === exact)
  }

  test("stream-maintained table ≡ batch-maintained table on the real corpus " +
    "(the fold is stateless per vector, so delta batching is irrelevant)") {
    val dir = "/root/testdata/sf0.001"
    val batch = AnnIndex.engineFor(spark, dir)      // bootstrap 90% + ONE fold
    val streamed = graft.streaming.StreamingQueries
      .streamAnnEngineFor(spark, dir)               // same delta as a 3-file stream
    def table(e: OlapEngine): Set[(Long, Int, Seq[Int])] =
      e.scan(AnnIndex.Db, AnnIndex.AssignTable).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(table(streamed) === table(batch))
  }

  test("re-fit ≡ fresh fit: bootstrap on the accumulated corpus supersedes " +
    "the old fit through plain table versions (same geometry)") {
    val boot = synth(0L until 80L)
    val delta = synth(100L until 120L)
    val all = boot.unionByName(delta)
    // maintained path: fit on boot, fold delta, then REFIT on the union
    val eng = mkEngine()
    bootstrapSmall(eng, boot)
    AnnIndex.applyDelta(eng, delta)
    val vBefore = eng.manifest(AnnIndex.Db, AnnIndex.AssignTable).maxVersion
    bootstrapSmall(eng, all)
    assert(eng.manifest(AnnIndex.Db, AnnIndex.AssignTable).maxVersion > vBefore,
      "refit must publish NEW versions, not collide with the old fit")
    // reference: the same fit on a fresh engine
    val fresh = mkEngine()
    bootstrapSmall(fresh, all)
    assert(stored(eng) === stored(fresh))
    assert(eng.scan(AnnIndex.Db, AnnIndex.CentroidTable).collect().toSet ===
      fresh.scan(AnnIndex.Db, AnnIndex.CentroidTable).collect().toSet)
  }

  test("empty delta is a no-op (no version published)") {
    val eng = mkEngine()
    bootstrapSmall(eng, synth(0L until 80L))
    val v = eng.manifest(AnnIndex.Db, AnnIndex.AssignTable).maxVersion
    AnnIndex.applyDelta(eng, synth(Nil))
    assert(eng.manifest(AnnIndex.Db, AnnIndex.AssignTable).maxVersion == v)
  }

  // --- drift trigger -------------------------------------------------------

  /** Mixture cluster c: equal weight on cluster c's and cluster (c+1)%4's
    * dimension blocks — sits on the boundary between the fitted cells, so
    * members split across cells and nprobe=1 routing loses the half that
    * went the other way. The engineered "distribution shifted" delta.
    */
  private def synthMix(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map { id =>
      val cl = (id % 4).toInt
      val rnd = new scala.util.Random(id)
      val base = Array.tabulate(16) { j =>
        if (j / 4 == cl || j / 4 == (cl + 1) % 4) 0.7 else 0.05
      }
      (id, base.map(x => (x + rnd.nextDouble() * 0.05).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  /** recall@k of the table-served top-k for probes vec_id < nProbes,
    * against an exact driver-side brute force (the corpus is spec-sized).
    */
  private def recallAt(eng: OlapEngine, emb: DataFrame,
                       nProbes: Int, k: Int, nprobe: Int): Double = {
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val brute = (0L until nProbes).map { p =>
      p -> vecs.toSeq.filter(_._1 != p)
        .sortBy { case (id, v) => (-cos(vecs(p), v), id) }
        .take(k).map(_._1).toSet
    }.toMap
    val served = AnnIndex.topKFromTable(eng, emb, nProbes, k, nprobe = nprobe)
      .select(col("probe_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    served.count { case (p, n) => brute(p).contains(n) }.toDouble / (nProbes * k)
  }

  test("drift trigger: a shifted delta raises the assignment-distance " +
    "ratio and degrades nprobe-limited recall; scheduleRefit fires and the " +
    "refit restores both (the q187 recall audit as harness)") {
    // fit corpus: ids 100-179 (the 4 well-separated clusters); drifted
    // delta: ids 0-79 on the cell boundaries. Probes are vec_id < 8, i.e.
    // DRIFTED vectors — the data the stale fit serves worst.
    val fitEmb = synth(100L until 180L)
    val drifted = synthMix(0L until 80L)
    val all = fitEmb.unionByName(drifted).localCheckpoint(true)
    val eng = mkEngine()
    AnnIndex.bootstrap(eng, fitEmb, nCells = 8, m = 4, kSub = 4)
    val st0 = AnnIndex.driftStatus(eng)
    assert(st0.nFolded == 0 && st0.distRatio == 1.0)

    // benign fold: vectors from the FIT distribution do not trip the trigger
    AnnIndex.applyDelta(eng, synth(200L until 220L))
    val (stBenign, firedBenign) = AnnIndex.scheduleRefit(eng, all,
      maxDistRatio = 1.5, maxFoldedFrac = 10.0, nCells = 8, m = 4, kSub = 4)
    assert(!firedBenign, s"benign fold must not refit: $stBenign")
    assert(stBenign.distRatio < 1.5)

    // drifted fold: far from every centroid — ratio climbs, recall drops
    AnnIndex.applyDelta(eng, drifted)
    val recallPre = recallAt(eng,
      all.unionByName(synth(200L until 220L)), nProbes = 8, k = 5, nprobe = 1)
    val (stDrift, fired) = AnnIndex.scheduleRefit(eng,
      all.unionByName(synth(200L until 220L)),
      maxDistRatio = 1.5, maxFoldedFrac = 10.0, nCells = 8, m = 4, kSub = 4)
    assert(fired, s"drifted fold must trip the trigger: $stDrift")
    assert(stDrift.distRatio >= 1.5,
      s"mixture vectors sit between cells; got ratio ${stDrift.distRatio}")

    // the refit opened a fresh generation and restored routing quality
    val stAfter = AnnIndex.driftStatus(eng)
    assert(stAfter.gen > stDrift.gen && stAfter.nFolded == 0)
    val recallPost = recallAt(eng,
      all.unionByName(synth(200L until 220L)), nProbes = 8, k = 5, nprobe = 1)
    assert(recallPost > recallPre,
      s"refit must improve drifted-probe recall: $recallPre -> $recallPost")
    assert(recallPost >= 0.8, s"post-refit recall too low: $recallPost")
  }

  test("scheduled compaction after a fold burst is answer-neutral and " +
    "collapses ivf_assign to one rowset (the engine's C1-C3 loop, not an " +
    "ad-hoc compact)") {
    val eng = mkEngine()
    val emb = synth(0L until 80L)
    bootstrapSmall(eng, emb.filter(col("vec_id") < 60))
    for (i <- 0 until 4) // fold burst: 4 delta loads = 5 assign fragments
      AnnIndex.applyDelta(eng,
        emb.filter(col("vec_id") >= 60 && col("vec_id") % 4 === i))
    val before = stored(eng)
    def serve() = AnnIndex.topKFromTable(eng, emb, nProbes = 4, k = 3)
      .collect().map(_.toSeq).toSet
    val served = serve()
    assert(eng.manifest(AnnIndex.Db, AnnIndex.AssignTable).compactionScore >= 5.0)
    val compacted = eng.runScheduledCompaction()
    assert(compacted.contains(s"${AnnIndex.Db}.${AnnIndex.AssignTable}"))
    assert(stored(eng) === before, "compaction must not change the index")
    assert(serve() === served, "compaction must not change the served answer")
    assert(eng.manifest(AnnIndex.Db, AnnIndex.AssignTable)
      .visibleRowsets.count(!_.isDeleteMarker) == 1)
    // a second run finds nothing above threshold: single-rowset tables
    // never rewrite (score floor = 2)
    assert(eng.runScheduledCompaction().isEmpty)
  }

  test("deleteVectors: tombstoned vectors leave the assignment table, never " +
    "serve as candidates, survive compaction, and re-adding resurrects") {
    import spark.implicits._
    val emb = synth(0L until 80L)
    val eng = mkEngine()
    bootstrapSmall(eng, emb)
    val before = stored(eng)
    AnnIndex.deleteVectors(eng, emb.filter(col("vec_id") % 5 === 1)
      .select("vec_id"))
    // index state: exactly the survivors, with their pre-delete assignments
    val after = stored(eng)
    assert(after.keySet === before.keySet.filter(_ % 5 != 1))
    assert(after === before.filter { case (id, _) => id % 5 != 1 })
    // serve: a deleted vector is never a candidate, survivors still rank
    def served(): Seq[(Long, Long)] =
      AnnIndex.topKFromTable(eng, emb, nProbes = 4, k = 3, nprobe = 4)
        .select(col("probe_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val s1 = served()
    assert(s1.nonEmpty && s1.forall(_._2 % 5 != 1))
    // compaction makes the tombstones physical without changing the answer
    eng.runScheduledCompaction()
    assert(stored(eng) === after)
    assert(served() === s1)
    // re-adding a deleted vector is applyDelta: the upsert beats the
    // tombstone and its assignment equals the pre-delete one (same formula)
    AnnIndex.applyDelta(eng, emb.filter(col("vec_id") === 6L))
    assert(stored(eng).get(6L) === before.get(6L))
    // deleting an unknown id is harmless (tombstone of nothing)
    AnnIndex.deleteVectors(eng, Seq(9999L).toDF("vec_id"))
    assert(stored(eng).keySet.contains(6L))
  }

  test("retrieval-quality gate: a healthy refit passes; a deliberately " +
    "degraded refit (corrupted corpus) fires the gate — the engine detects " +
    "the quality regression, not the operator") {
    import spark.implicits._
    val eng = mkEngine()
    val emb = synth(0L until 80L).localCheckpoint(true)
    bootstrapSmall(eng, emb)
    val installed = AnnIndex.installEvalGate(eng, emb, nProbes = 4, k = 3)
    assert(installed.recall > 0.0, "install-time serve must find something")
    // healthy refit on the true corpus: drift trigger forced, gate passes
    val (_, fired1, gate1) = AnnIndex.guardedRefit(eng, emb,
      maxFoldedFrac = 0.0, nCells = 4, m = 4, kSub = 4)
    assert(fired1 && gate1.exists(_.pass),
      s"healthy refit must pass the gate: $gate1")
    assert(gate1.get.recallRatio >= 0.8)
    // degraded refit: the corpus handed to the refit has its vectors
    // SHUFFLED across ids (vec_id i carries vector of i+37 mod n), so the
    // rebuilt index returns neighbors of the wrong vectors — drift stats
    // alone cannot see this (the geometry is identical), the quality gate
    // must
    val n = 80L
    val shuffled = emb.select(
        pmod(col("vec_id") + 37L, lit(n)).as("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val (_, fired2, gate2) = AnnIndex.guardedRefit(eng, shuffled,
      maxFoldedFrac = 0.0, nCells = 4, m = 4, kSub = 4)
    assert(fired2 && gate2.exists(!_.pass),
      s"corrupted refit must FIRE the gate: $gate2")
    assert(gate2.get.recall < gate2.get.baselineRecall,
      s"recall must visibly degrade: $gate2")
    // the scorecard history landed next to the fit history (one row per
    // evaluated generation, baseline = the earliest)
    val gens = eng.scan(AnnIndex.Db, AnnIndex.EvalStatsTable)
      .collect().map(_.getLong(0)).sorted
    assert(gens.length >= 3 && gens.distinct.length == gens.length)
  }
}
