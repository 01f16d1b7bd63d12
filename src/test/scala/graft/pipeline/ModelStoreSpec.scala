package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.engine.OlapEngine

/** The trained-model store: LM fold ≡ one-shot counts (Sum-merge algebra),
  * restart-shaped serving (a FRESH engine over the same warehouse serves
  * every model without re-fitting — the gap that motivated the store), and
  * re-fit publishing through plain table versions.
  */
class ModelStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Deterministic texts: small vocabulary, length spread around the n_chars
    * label boundary so the logreg fit sees both classes.
    */
  private def synth(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    val vocab = Vector("spark", "data", "join", "query", "the", "of", "alpha",
      "beta", "gamma", "delta")
    ids.map { id =>
      val rnd = new scala.util.Random(id)
      val n = 3 + rnd.nextInt(80)
      val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (id, text, text.length)
    }.toDF("doc_id", "text", "n_chars")
  }

  private def mkEngine(): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-mstore-wh-"))
    ModelStore.createTables(eng)
    eng
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("LM fold ≡ one-shot counts: folding in two batches Sum-merges to the " +
    "full-corpus unigram/bigram counts exactly") {
    val docs = synth(0L until 50L)
    val oneShot = mkEngine()
    ModelStore.lmFold(oneShot, docs)
    val folded = mkEngine()
    ModelStore.lmFold(folded, docs.filter(col("doc_id") % 10 =!= 0))
    ModelStore.lmFold(folded, docs.filter(col("doc_id") % 10 === 0))
    for (t <- Seq(ModelStore.UniTable, ModelStore.BigTable))
      assert(rows(folded.scan(ModelStore.Db, t)) ===
        rows(oneShot.scan(ModelStore.Db, t)), t)
    // and the served score agrees between the two maintenance histories
    assert(rows(ModelStore.bigramQualityFromTables(folded, docs)) ===
      rows(ModelStore.bigramQualityFromTables(oneShot, docs)))
  }

  test("restart shape: a FRESH engine over the same warehouse serves all " +
    "three models without re-fitting (publishes nothing, answers match)") {
    val docs = synth(0L until 40L).localCheckpoint(true)
    val eng = mkEngine()
    ModelStore.lmFold(eng, docs)
    ModelStore.bootstrapBpe(eng, docs, nMerges = 5)
    ModelStore.bootstrapLogreg(eng, docs)
    val lmA = rows(ModelStore.bigramQualityFromTables(eng, docs))
    val bpeA = rows(ModelStore.bpeTokenizeFromTable(eng, docs))
    val lrA = rows(ModelStore.logregQualityFromTable(eng, docs))

    // "restart": a new engine object over the SAME warehouse path — the
    // manifests reload from disk; createTables is the DDL replay a
    // deployment runs, it touches no data
    val fresh = new OlapEngine(spark, eng.warehouse)
    ModelStore.createTables(fresh)
    val before = Seq(ModelStore.BpeTable, ModelStore.LogregTable,
      ModelStore.UniTable, ModelStore.BigTable)
      .map(t => fresh.manifest(ModelStore.Db, t).maxVersion)
    assert(rows(ModelStore.bigramQualityFromTables(fresh, docs)) === lmA)
    assert(rows(ModelStore.bpeTokenizeFromTable(fresh, docs)) === bpeA)
    assert(rows(ModelStore.logregQualityFromTable(fresh, docs)) === lrA)
    val after = Seq(ModelStore.BpeTable, ModelStore.LogregTable,
      ModelStore.UniTable, ModelStore.BigTable)
      .map(t => fresh.manifest(ModelStore.Db, t).maxVersion)
    assert(after === before, "serving must publish nothing")
  }

  test("served forms equal the in-JVM forms on the same corpus (one answer, " +
    "two derivations — the q193/q194/q195 contract in miniature)") {
    val docs = synth(0L until 40L).localCheckpoint(true)
    val eng = mkEngine()
    ModelStore.lmFold(eng, docs)
    ModelStore.bootstrapBpe(eng, docs, nMerges = 5)
    // LM: table-served score vs the formula recomputed from scratch
    val ws = split(trim(lower(col("text"))), "\\s+")
    val d = docs.select(col("doc_id"),
      zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))).as("bg"), ws.as("ws"))
    val uni = d.select(explode(col("ws")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val big = d.select(explode(col("bg")).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cb"))
    val vocab = uni.agg(count(lit(1)).as("vocab"))
    val scratch = d.select(col("doc_id"), explode(col("bg")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .join(big, Seq("w1", "w2")).join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        round(log((col("cb") + lit(1)).cast("double") /
          (col("cu") + col("vocab")).cast("double")), 8)
          .cast("decimal(18,8)").as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp")).cast("double") / count(lit(1)), 4).as("avg_logp"))
    assert(rows(ModelStore.bigramQualityFromTables(eng, docs)) === rows(scratch))
    // BPE: table-served tokenize vs tokenize with the freshly-trained merges
    val trained = Corpus.bpeMergesOf(docs, 5).collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(rows(ModelStore.bpeTokenizeFromTable(eng, docs)) ===
      rows(Corpus.tokenizeWithMerges(docs, trained)))
  }

  test("exactly-once streaming LM fold: a replayed micro-batch is skipped " +
    "(Sum tables would double-count), and a crash between the two table " +
    "publishes heals on replay") {
    val docs = synth(0L until 40L).localCheckpoint(true)
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 === 1)
    val eng = mkEngine()
    ModelStore.lmFoldBatch(eng, b1, batchId = 0)
    ModelStore.lmFoldBatch(eng, b2, batchId = 1)
    val after = (rows(eng.scan(ModelStore.Db, ModelStore.UniTable)),
      rows(eng.scan(ModelStore.Db, ModelStore.BigTable)))
    // full replay of both batches: the manifest's duplicate-rowset check is
    // the ledger — counts unchanged
    ModelStore.lmFoldBatch(eng, b1, batchId = 0)
    ModelStore.lmFoldBatch(eng, b2, batchId = 1)
    assert((rows(eng.scan(ModelStore.Db, ModelStore.UniTable)),
      rows(eng.scan(ModelStore.Db, ModelStore.BigTable))) === after,
      "replayed batches must not double-count")
    // and the ledgered fold equals the plain batch fold of the same data
    val ref = mkEngine()
    ModelStore.lmFold(ref, b1)
    ModelStore.lmFold(ref, b2)
    assert(rows(eng.scan(ModelStore.Db, ModelStore.UniTable)) ===
      rows(ref.scan(ModelStore.Db, ModelStore.UniTable)))
    assert(rows(eng.scan(ModelStore.Db, ModelStore.BigTable)) ===
      rows(ref.scan(ModelStore.Db, ModelStore.BigTable)))

    // crash-heal: simulate "uni published, big lost" for batch 7 by folding
    // uni alone at batch 7's deterministic rowset id, then replaying the
    // whole batch — uni skips, big folds, state converges
    val eng2 = mkEngine()
    ModelStore.lmFoldBatch(eng2, b1, batchId = 0)
    val b3 = docs.filter(col("doc_id") % 2 === 1)
    val ws = split(trim(lower(col("text"))), "\\s+")
    eng2.ingest(ModelStore.Db, ModelStore.UniTable,
      b3.select(explode(ws).as("w1")).groupBy(col("w1"))
        .agg(count(lit(1)).as("cu")),
      Some(graft.manifest.Version(
        eng2.manifest(ModelStore.Db, ModelStore.UniTable).maxVersion + 1,
        eng2.manifest(ModelStore.Db, ModelStore.UniTable).maxVersion + 1)),
      explicitRowsetId = Some(1000000L + 7))
    ModelStore.lmFoldBatch(eng2, b3, batchId = 7) // the replay after the crash
    assert(rows(eng2.scan(ModelStore.Db, ModelStore.UniTable)) ===
      rows(ref.scan(ModelStore.Db, ModelStore.UniTable)),
      "uni must not double-count across the partial publish + replay")
    assert(rows(eng2.scan(ModelStore.Db, ModelStore.BigTable)) ===
      rows(ref.scan(ModelStore.Db, ModelStore.BigTable)),
      "big must fold on the replay (it missed the first attempt)")
  }

  test("streaming LM fold heals a MID-STAGE crash: an uncommitted staged " +
    "group at the batch's deterministic ids is reaped and the batch refolds") {
    val docs = synth(0L until 30L).localCheckpoint(true)
    val b = docs.filter(col("doc_id") % 3 === 0)
    val eng = mkEngine()
    // simulate the crash: stage batch 5's unigram half under a group that
    // never commits (the process died before commitGroup)
    val ws = split(trim(lower(col("text"))), "\\s+")
    val g = eng.newLoadGroup()
    eng.ingest(ModelStore.Db, ModelStore.UniTable,
      b.select(explode(ws).as("w1")).groupBy(col("w1"))
        .agg(count(lit(1)).as("cu")),
      Some(graft.manifest.Version(0, 0)),
      explicitRowsetId = Some(1000000L + 5), group = Some(g))
    // nothing serves from the stale stage
    assert(rows(eng.scan(ModelStore.Db, ModelStore.UniTable)).isEmpty)
    // the replay reaps the stage (freeing the deterministic id) and refolds
    ModelStore.lmFoldBatch(eng, b, batchId = 5)
    val ref = mkEngine()
    ModelStore.lmFold(ref, b)
    assert(rows(eng.scan(ModelStore.Db, ModelStore.UniTable)) ===
      rows(ref.scan(ModelStore.Db, ModelStore.UniTable)))
    assert(rows(eng.scan(ModelStore.Db, ModelStore.BigTable)) ===
      rows(ref.scan(ModelStore.Db, ModelStore.BigTable)))
    // and a second replay is the committed-skip case
    ModelStore.lmFoldBatch(eng, b, batchId = 5)
    assert(rows(eng.scan(ModelStore.Db, ModelStore.UniTable)) ===
      rows(ref.scan(ModelStore.Db, ModelStore.UniTable)))
  }

  test("BPE drift trigger: a disjoint-alphabet batch inflates the " +
    "compression ratio, the refit fires and restores it; a same-alphabet " +
    "batch does not fire") {
    import spark.implicits._
    val docs = synth(0L until 40L).localCheckpoint(true)
    val eng = mkEngine()
    ModelStore.bootstrapBpe(eng, docs, nMerges = 5)
    // benign: more text from the same vocabulary — merges still compress
    val (stSame, firedSame) = ModelStore.scheduleBpeRefit(
      eng, docs, synth(100L until 120L), maxRatio = 1.3, nMerges = 5)
    assert(!firedSame, s"same-distribution batch must not refit: $stSame")
    // drifted: a disjoint alphabet no learned merge applies to — every word
    // tokenizes to its characters, tokens-per-word inflates. Large enough
    // that the accumulated-corpus refit's top merge counts come from the
    // NEW vocabulary (the realistic shift: new data dominates)
    val drifted = (200L until 400L).map { id =>
      val rnd = new scala.util.Random(id)
      val vocab = Vector("zzyx", "qwvk", "xjplm", "vbnqr", "kwzzt")
      val text = Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (id, text, text.length)
    }.toDF("doc_id", "text", "n_chars").localCheckpoint(true)
    val (stDrift, fired) = ModelStore.scheduleBpeRefit(
      eng, docs.unionByName(drifted), drifted, maxRatio = 1.3, nMerges = 5)
    assert(fired, s"disjoint-alphabet batch must trip the trigger: $stDrift")
    assert(stDrift.ratio >= 1.3)
    // the refit learned the new vocabulary: the same batch now compresses
    val after = ModelStore.bpeDriftStatus(eng, drifted)
    assert(after.gen > stDrift.gen, "refit must open a new generation")
    assert(after.batchStat < stDrift.batchStat,
      s"refit must restore compression: ${stDrift.batchStat} -> ${after.batchStat}")
  }

  test("logreg drift trigger: a batch with a flipped feature-label " +
    "relationship craters stored-model accuracy and fires the refit; a " +
    "same-distribution batch does not") {
    import spark.implicits._
    val docs = synth(0L until 60L).localCheckpoint(true)
    val eng = mkEngine()
    ModelStore.bootstrapLogreg(eng, docs)
    val (stSame, firedSame) = ModelStore.scheduleLogregRefit(
      eng, docs, synth(100L until 130L), minRatio = 0.8)
    assert(!firedSame, s"same-distribution batch must not refit: $stSame")
    // drift: invert the label-bearing column — long texts carry SMALL
    // n_chars, so the stored length-sign weight misclassifies
    val flipped = synth(200L until 230L)
      .select(col("doc_id"), col("text"),
        (lit(700) - col("n_chars")).as("n_chars")).localCheckpoint(true)
    val vBefore = eng.manifest(ModelStore.Db, ModelStore.LogregTable).maxVersion
    val (stDrift, fired) = ModelStore.scheduleLogregRefit(
      eng, docs, flipped, minRatio = 0.8)
    assert(fired, s"flipped-label batch must trip the trigger: $stDrift")
    assert(stDrift.ratio <= 0.8)
    assert(eng.manifest(ModelStore.Db, ModelStore.LogregTable).maxVersion > vBefore,
      "the refit must publish a new weights version")
  }

  test("re-fit publishes the next versions: retraining on a grown corpus " +
    "supersedes the stored BPE/logreg models atomically") {
    val docs0 = synth(0L until 30L).localCheckpoint(true)
    val grown = synth(0L until 60L).localCheckpoint(true)
    val eng = mkEngine()
    ModelStore.bootstrapBpe(eng, docs0, nMerges = 5)
    ModelStore.bootstrapLogreg(eng, docs0)
    val v0 = eng.manifest(ModelStore.Db, ModelStore.BpeTable).maxVersion
    ModelStore.bootstrapBpe(eng, grown, nMerges = 5)
    ModelStore.bootstrapLogreg(eng, grown)
    assert(eng.manifest(ModelStore.Db, ModelStore.BpeTable).maxVersion > v0)
    // the refit engine serves exactly what a fresh fit on the grown corpus does
    val ref = mkEngine()
    ModelStore.bootstrapBpe(ref, grown, nMerges = 5)
    ModelStore.bootstrapLogreg(ref, grown)
    assert(rows(ModelStore.bpeTokenizeFromTable(eng, grown)) ===
      rows(ModelStore.bpeTokenizeFromTable(ref, grown)))
    assert(rows(ModelStore.logregQualityFromTable(eng, grown)) ===
      rows(ModelStore.logregQualityFromTable(ref, grown)))
  }
}
