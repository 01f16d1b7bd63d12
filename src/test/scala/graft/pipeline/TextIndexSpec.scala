package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.engine.OlapEngine

/** The maintained inverted-text-index engine tables: fold ≡ one-shot build
  * (a document's postings depend on that document alone), fold idempotence,
  * the table-served BM25 against the from-scratch recompute, stream ≡ batch
  * maintenance, and the bucket-pruned serve scan.
  */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def synth(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    // deterministic texts over a small vocabulary that includes the default
    // probe terms, with per-doc repetition so tf > 1 paths are exercised
    val vocab = Vector("spark", "data", "join", "query", "alpha", "beta", "gamma")
    ids.map { id =>
      val rnd = new scala.util.Random(id)
      val n = 5 + rnd.nextInt(20)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def mkEngine(): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-txtspec-wh-"))
    TextIndex.createTables(eng)
    eng
  }

  private def postings(eng: OlapEngine): Set[(String, Long, Long)] =
    eng.scan(TextIndex.Db, TextIndex.PostingsTable).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def doclens(eng: OlapEngine): Set[(Long, Long)] =
    eng.scan(TextIndex.Db, TextIndex.DoclenTable).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("fold ≡ one-shot build: bootstrap(all) and bootstrap(90%) + fold(10%) " +
    "produce identical postings and doclen tables") {
    val docs = synth(0L until 60L)
    val oneShot = mkEngine()
    TextIndex.bootstrap(oneShot, docs)
    val folded = mkEngine()
    TextIndex.bootstrap(folded, docs.filter(col("doc_id") % 10 =!= 0))
    TextIndex.applyDelta(folded, docs.filter(col("doc_id") % 10 === 0))
    assert(postings(folded) === postings(oneShot))
    assert(doclens(folded) === doclens(oneShot))
  }

  test("fold idempotence: re-folding already-indexed documents rewrites " +
    "identical rows (the streaming replay-safety contract)") {
    val docs = synth(0L until 40L)
    val eng = mkEngine()
    TextIndex.bootstrap(eng, docs)
    val (p0, d0) = (postings(eng), doclens(eng))
    TextIndex.applyDelta(eng, docs.filter(col("doc_id") < 20))
    assert(postings(eng) === p0)
    assert(doclens(eng) === d0)
  }

  test("changed-document re-fold: the Unique upsert replaces the doc's tf " +
    "and dl rows") {
    import spark.implicits._
    val eng = mkEngine()
    TextIndex.bootstrap(eng, Seq((1L, "spark data data")).toDF("doc_id", "text"))
    assert(postings(eng) === Set(("spark", 1L, 1L), ("data", 1L, 2L)))
    // the revised doc still contains both words, so no tombstones needed
    TextIndex.applyDelta(eng, Seq((1L, "spark spark data")).toDF("doc_id", "text"))
    assert(postings(eng) === Set(("spark", 1L, 2L), ("data", 1L, 1L)))
    assert(doclens(eng) === Set((1L, 3L)))
  }

  test("empty delta is a no-op (no version published)") {
    val eng = mkEngine()
    TextIndex.bootstrap(eng, synth(0L until 10L))
    val v = eng.manifest(TextIndex.Db, TextIndex.PostingsTable).maxVersion
    TextIndex.applyDelta(eng, synth(Nil))
    assert(eng.manifest(TextIndex.Db, TextIndex.PostingsTable).maxVersion == v)
  }

  test("scheduled compaction folds the fold rowsets without changing the " +
    "index content or the served BM25") {
    val docs = synth(0L until 60L)
    val eng = mkEngine()
    TextIndex.bootstrap(eng, docs.filter(col("doc_id") % 10 =!= 0))
    TextIndex.applyDelta(eng, docs.filter(col("doc_id") % 10 === 0))
    val (p0, d0) = (postings(eng), doclens(eng))
    val served0 = TextIndex.bm25FromTable(eng).collect().toSeq
    TextIndex.compactIndex(eng)
    assert(eng.manifest(TextIndex.Db, TextIndex.PostingsTable)
      .visibleRowsets.size == 1, "full compaction must leave one rowset")
    assert(postings(eng) === p0)
    assert(doclens(eng) === d0)
    assert(TextIndex.bm25FromTable(eng).collect().toSeq === served0)
  }

  test("served BM25 ≡ from-scratch corpus BM25 bit-for-bit on the real " +
    "corpus (q190's fixture vs q118's recompute)") {
    val dir = "/root/testdata/sf0.001"
    val served = TextIndex.bm25FromTable(TextIndex.engineFor(spark, dir))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val scratch = TextAnalysis.bm25TopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served === scratch)
  }

  test("batch retrieval (q205): each query's slice of the one-join batch " +
    "plan equals that query's standalone single-query serve") {
    val dir = "/root/testdata/sf0.001"
    val eng = TextIndex.engineFor(spark, dir)
    val batch = TextIndex.batchBm25FromTable(eng).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSet).toMap
    val termSets = Map(0L -> Seq("spark", "data"), 1L -> Seq("join", "query"),
      2L -> Seq("merge", "sort"))
    termSets.foreach { case (qid, terms) =>
      val solo = TextIndex.bm25FromTable(eng, terms, k = 5).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(batch(qid) === solo, s"query $qid diverges from its solo serve")
    }
  }

  test("reverse search (q208): the served pairs are exactly the conjunctive " +
    "matches a direct corpus recompute produces") {
    val dir = "/root/testdata/sf0.001"
    val got = TextIndex.reverseSearch(TextIndex.engineFor(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        split(trim(lower(col("text"))), "\\s+").as("ws"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val queries = Map(
      0L -> Set("spark", "data", "join", "query"),
      1L -> Set("merge", "sort", "hash", "scan"),
      2L -> Set("vector", "window", "stream", "batch"))
    val expected = (for {
      (qid, terms) <- queries.toSeq
      (doc, ws) <- words if terms.subsetOf(ws)
    } yield (qid, doc)).toSet
    assert(got === expected)
    assert(got.size < 3 * words.length, "conjunction should exclude some docs")
  }

  test("served RM3 ≡ from-scratch RM3 bit-for-bit on the real corpus " +
    "(q203: same feedback docs, same expansion pick, same final ranking)") {
    val dir = "/root/testdata/sf0.001"
    val served = TextIndex.rm3FromTable(TextIndex.engineFor(spark, dir))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val scratch = TextAnalysis.rm3TopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served === scratch)
    // and the expansion actually changed the ranking vs plain BM25 — the
    // feedback loop is live, not a fixed-point no-op
    val plain = TextAnalysis.bm25TopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served !== plain)
  }

  test("stream-maintained table ≡ batch-maintained table on the real corpus " +
    "(the fold is stateless per document, so delta batching is irrelevant)") {
    val dir = "/root/testdata/sf0.001"
    val batch = TextIndex.engineFor(spark, dir)    // bootstrap 90% + ONE fold
    val streamed = graft.streaming.StreamingQueries
      .streamTextEngineFor(spark, dir)             // same delta as a 3-file stream
    assert(postings(streamed) === postings(batch))
    assert(doclens(streamed) === doclens(batch))
  }

  test("refold of CHANGED documents ≡ fresh build of the edited corpus: " +
    "upserts land AND vanished words are tombstoned in one atomic merge") {
    val docs = synth(0L until 60L)
    // edit: every 5th doc keeps only its first 3 tokens — words vanish
    val edited = docs.select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat_ws(" ", slice(split(trim(lower(col("text"))), "\\s+"), 1, 3)))
        .otherwise(col("text")).as("text"))
    val eng = mkEngine()
    TextIndex.bootstrap(eng, docs)
    val vPost = eng.manifest(TextIndex.Db, TextIndex.PostingsTable).maxVersion
    TextIndex.refold(eng, edited.filter(col("doc_id") % 5 === 0))
    // ONE postings version: upserts + tombstones published atomically
    assert(eng.manifest(TextIndex.Db, TextIndex.PostingsTable).maxVersion == vPost + 1)
    val fresh = mkEngine()
    TextIndex.bootstrap(fresh, edited)
    assert(postings(eng) === postings(fresh),
      "refolded index must equal a from-scratch build of the edited corpus")
    assert(doclens(eng) === doclens(fresh))
    // and the tombstones survive compaction (deletes become physical)
    TextIndex.compactIndex(eng)
    assert(postings(eng) === postings(fresh))
  }

  test("refold of an UNCHANGED document is a pure no-op on content " +
    "(no vanished words, identical rows rewritten)") {
    val docs = synth(0L until 30L)
    val eng = mkEngine()
    TextIndex.bootstrap(eng, docs)
    val before = (postings(eng), doclens(eng))
    TextIndex.refold(eng, docs.filter(col("doc_id") % 3 === 0))
    assert((postings(eng), doclens(eng)) === before)
  }

  private def fwdRows(eng: OlapEngine): Set[(Long, Seq[String])] =
    eng.scan(TextIndex.Db, TextIndex.FwdTable).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1))).toSet

  test("forward table tracks the index: after fold AND refold it holds " +
    "exactly each document's sorted distinct words") {
    val docs = synth(0L until 40L)
    val eng = mkEngine()
    TextIndex.bootstrap(eng, docs.filter(col("doc_id") % 10 =!= 0))
    TextIndex.applyDelta(eng, docs.filter(col("doc_id") % 10 === 0))
    def expected(d: org.apache.spark.sql.DataFrame): Set[(Long, Seq[String])] =
      d.collect().map { r =>
        (r.getLong(0),
          r.getString(1).trim.toLowerCase.split("\\s+").distinct.sorted.toSeq)
      }.toSet
    assert(fwdRows(eng) === expected(docs))
    // refold keeps it current (the diff source must never go stale)
    val edited = docs.select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat_ws(" ", slice(split(trim(lower(col("text"))), "\\s+"), 1, 3)))
        .otherwise(col("text")).as("text"))
    TextIndex.refold(eng, edited.filter(col("doc_id") % 5 === 0))
    assert(fwdRows(eng) === expected(edited))
  }

  test("deleteDocs: postings, doclen and forward rows all tombstone, the " +
    "served BM25 equals a fresh index of the survivors, unknown ids no-op") {
    import spark.implicits._
    val docs = synth(0L until 50L)
    val eng = mkEngine()
    TextIndex.bootstrap(eng, docs)
    TextIndex.deleteDocs(eng,
      docs.filter(col("doc_id") % 4 === 1).select("doc_id"))
    TextIndex.deleteDocs(eng, Seq(99999L).toDF("doc_id")) // unknown: no-op
    val fresh = mkEngine()
    TextIndex.bootstrap(fresh, docs.filter(col("doc_id") % 4 =!= 1))
    assert(postings(eng) === postings(fresh))
    assert(doclens(eng) === doclens(fresh))
    assert(fwdRows(eng) === fwdRows(fresh))
    def serve(e: OlapEngine): Seq[(Long, Double)] =
      TextIndex.bm25FromTable(e).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(serve(eng) === serve(fresh))
    // compaction makes the tombstones physical without changing anything
    TextIndex.compactIndex(eng)
    assert(postings(eng) === postings(fresh))
    assert(serve(eng) === serve(fresh))
    // re-adding a deleted document is applyDelta: upsert beats tombstone
    TextIndex.applyDelta(eng, docs.filter(col("doc_id") === 1L))
    assert(doclens(eng) === doclens(fresh) ++
      doclens(mkEngineWith(docs.filter(col("doc_id") === 1L))))
  }

  private def mkEngineWith(docs: org.apache.spark.sql.DataFrame): OlapEngine = {
    val e = mkEngine()
    TextIndex.bootstrap(e, docs)
    e
  }

  test("the serve's postings scan bucket-prunes to the probed terms' buckets") {
    val dir = "/root/testdata/sf0.001"
    val eng = TextIndex.engineFor(spark, dir)
    val plan = TextIndex.bm25FromTable(eng)
      .queryExecution.executedPlan.toString
    assert(plan.contains(eng.BucketCol) || plan.contains("__graft_bucket"),
      s"no bucket-prune filter in the serve plan:\n$plan")
  }

  test("standing-query registry: register/unregister round-trip; the stored " +
    "rules serve reverseSearch and percolate identically; a retired rule " +
    "stops matching everywhere") {
    import spark.implicits._
    val eng = mkEngine()
    TextIndex.createPercolatorTables(eng)
    val docs = synth(0L until 50L).localCheckpoint(true)
    TextIndex.bootstrap(eng, docs)
    val rules = Seq((0L, "spark"), (0L, "data"), (7L, "alpha"))
      .toDF("query_id", "w")
    TextIndex.registerQueries(eng, rules)
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaIndex = pairs(TextIndex.reverseSearchStored(eng))
    val viaFirehose = pairs(TextIndex.percolate(eng, docs))
    val literal = pairs(TextIndex.reverseSearch(eng, rules))
    assert(viaIndex === literal, "stored rules must serve like literal rules")
    assert(viaFirehose === literal, "direct percolation must agree with the index route")
    assert(viaIndex.exists(_._1 == 7L), "the 1-term rule matches something")
    // retire rule 7: every route stops matching it; rule 0 is untouched
    TextIndex.unregisterQueries(eng, Seq(7L).toDF("query_id"))
    val after = pairs(TextIndex.reverseSearchStored(eng))
    assert(after === literal.filterNot(_._1 == 7L))
    assert(pairs(TextIndex.percolate(eng, docs)) === after)
    // unknown id: harmless no-op
    TextIndex.unregisterQueries(eng, Seq(123L).toDF("query_id"))
    assert(pairs(TextIndex.reverseSearchStored(eng)) === after)
    // re-registering beats the tombstone (rule resurrection is an upsert)
    TextIndex.registerQueries(eng, Seq((7L, "alpha")).toDF("query_id", "w"))
    assert(pairs(TextIndex.reverseSearchStored(eng)) === literal)
  }

  test("stream percolator ≡ batch reverse search on the real corpus (the " +
    "hits table accumulates exactly the conjunctive matches)") {
    val dir = "/root/testdata/sf0.001"
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = pairs(graft.streaming.StreamingQueries
      .streamPercolator(spark, dir))
    val batch = pairs(TextIndex.reverseSearchStored(
      TextIndex.registryEngineFor(spark, dir)))
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("storedWords large-batch fallback: above FwdLookupMaxIds the lookup " +
    "semi-joins WITHOUT a forced broadcast and still returns exactly the " +
    "stored pairs") {
    import spark.implicits._
    val docs = synth(0L until 50L)
    val eng = mkEngine()
    TextIndex.bootstrap(eng, docs)
    // a batch past the IN-literal cap: 50 real ids + enough unknowns to
    // cross FwdLookupMaxIds (unknown ids must be harmless no-matches)
    val big = (0L until (TextIndex.FwdLookupMaxIds + 100L)).toDF("doc_id")
    val rows = TextIndex.storedWords(eng, big)
    // the contract under fix: an unbounded batch must never be wedged
    // through the driver — no broadcast HINT on the probe side (AQE may
    // still elect a broadcast at runtime when the probe is actually small)
    val analyzed = rows.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"large-batch storedWords must not force a broadcast:\n$analyzed")
    val expected = docs.collect().flatMap { r =>
      r.getString(1).split("\\s+").distinct.map(w => (r.getLong(0), w))
    }.toSet
    val got = rows.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === expected)
    // the small-batch path (IN-literal file pruning) is unchanged
    val small = TextIndex.storedWords(eng, Seq(3L, 4L).toDF("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(small === expected.filter(p => p._1 == 3L || p._1 == 4L))
  }
}
