package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.engine.OlapEngine

/** The maintained positional-index engine tables: fold ≡ one-shot build,
  * the slot algebra against a direct substring recompute (incl. repeated
  * words and overlapping occurrences), refold tombstoning for vanished
  * words, and KWIC window clamping at document edges.
  */
class PhraseIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docsOf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def synth(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    val vocab = Vector("table", "hash", "big", "order", "scan", "alpha", "beta")
    ids.map { id =>
      val rnd = new scala.util.Random(id)
      val n = 5 + rnd.nextInt(20)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def mkEngine(): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-phrspec-wh-"))
    PhraseIndex.createTables(eng)
    eng
  }

  private def rows(eng: OlapEngine): Set[(String, Long, Seq[Int])] =
    eng.scan(PhraseIndex.Db, PhraseIndex.PositionsTable).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Int](2))).toSet

  private def hits(eng: OlapEngine, phrase: String*): Set[(Long, Int)] =
    PhraseIndex.phraseHits(eng, phrase).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet

  /** Direct recompute: every start where the token stream equals the
    * phrase, the definition the slot algebra must reproduce.
    */
  private def bruteHits(docs: Seq[(Long, String)], phrase: Seq[String])
  : Set[(Long, Int)] =
    docs.flatMap { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      toks.indices.collect {
        case i if toks.slice(i, i + phrase.length) == phrase => (id, i + 1)
      }
    }.toSet

  test("fold ≡ one-shot build: bootstrap(all) and bootstrap(90%) + fold(10%) " +
    "produce identical position tables") {
    val docs = synth(0L until 60L)
    val oneShot = mkEngine()
    PhraseIndex.bootstrap(oneShot, docs)
    val folded = mkEngine()
    PhraseIndex.bootstrap(folded, docs.filter(col("doc_id") % 10 =!= 0))
    PhraseIndex.applyDelta(folded, docs.filter(col("doc_id") % 10 === 0))
    assert(rows(folded) === rows(oneShot))
    assert(rows(folded).nonEmpty)
  }

  test("phrase hits ≡ direct token-stream recompute, including overlapping " +
    "occurrences and a repeated-word phrase that must not self-satisfy") {
    val fixture = Seq(
      1L -> "table hash table hash table", // overlapping bigram hits at 1, 3
      2L -> "hash table hash",             // reversed order: no 'table hash'
      3L -> "table table table",           // repeated-word phrase territory
      4L -> "big order scan big order",    // trigram at 1; partial at 4
      5L -> "alpha beta table hash beta")  // mid-document hit
    val eng = mkEngine()
    PhraseIndex.bootstrap(eng, docsOf(fixture: _*))
    for (phrase <- Seq(Seq("table", "hash"), Seq("big", "order", "scan"),
        Seq("table", "table"), Seq("hash"))) {
      assert(hits(eng, phrase: _*) === bruteHits(fixture, phrase),
        s"phrase $phrase")
    }
    // the repeated-word phrase: one 'table' token may not satisfy two slots
    assert(hits(eng, "table", "table") === Set(3L -> 1, 3L -> 2))
  }

  test("refold: a vanished word's positions are tombstoned, surviving words' " +
    "arrays are replaced, untouched documents keep serving") {
    val eng = mkEngine()
    PhraseIndex.bootstrap(eng, docsOf(
      1L -> "table hash scan",
      2L -> "table hash"))
    // doc 1 edited: 'hash' vanishes, 'table' moves, 'big' appears
    PhraseIndex.refold(eng, docsOf(1L -> "big table scan"))
    val expected = Set[(String, Long, Seq[Int])](
      ("big", 1L, Seq(1)), ("table", 1L, Seq(2)), ("scan", 1L, Seq(3)),
      ("table", 2L, Seq(1)), ("hash", 2L, Seq(2)))
    assert(rows(eng) === expected)
    // the phrase that existed only in the old doc 1 text is gone; doc 2 serves
    assert(hits(eng, "table", "hash") === Set(2L -> 1))
    // compaction (physical tombstone removal) is answer-neutral
    eng.runScheduledCompaction()
    assert(rows(eng) === expected)
  }

  test("deleteDocs: every row of the doomed documents tombstones, phrase " +
    "hits vanish, survivors and unknown ids are untouched") {
    import spark.implicits._
    val eng = mkEngine()
    PhraseIndex.bootstrap(eng, docsOf(
      1L -> "table hash alpha",
      2L -> "table hash beta",
      3L -> "big order scan"))
    PhraseIndex.deleteDocs(eng, Seq(1L, 999L).toDF("doc_id"))
    assert(rows(eng).map(_._2).toSet === Set(2L, 3L))
    assert(hits(eng, "table", "hash") === Set(2L -> 1))
    assert(hits(eng, "big", "order", "scan") === Set(3L -> 1))
    // compaction makes the tombstones physical without changing the answer
    eng.runScheduledCompaction()
    assert(hits(eng, "table", "hash") === Set(2L -> 1))
    // re-adding a deleted document is applyDelta: the upsert beats the
    // tombstone
    PhraseIndex.applyDelta(eng, docsOf(1L -> "table hash alpha"))
    assert(hits(eng, "table", "hash") === Set(1L -> 1, 2L -> 1))
  }

  test("stream-maintained table ≡ batch-maintained table on the real corpus " +
    "(the fold is stateless per document, so delta batching is irrelevant)") {
    val dir = "/root/testdata/sf0.001"
    val batch = PhraseIndex.engineFor(spark, dir)  // bootstrap 90% + ONE fold
    val streamed = graft.streaming.StreamingQueries
      .streamPhraseEngineFor(spark, dir)           // same delta, 3-file stream
    assert(rows(streamed) === rows(batch))
    assert(rows(streamed).nonEmpty)
  }

  test("co-resident family: ONE deleteDocs/refold updates keyword AND " +
    "positional tables atomically from the shared forward table") {
    import spark.implicits._
    val eng = mkEngine() // positions + fwd
    TextIndex.createTables(eng) // postings + doclen; adopts the same fwd
    val docs = docsOf(
      1L -> "table hash alpha",
      2L -> "table hash beta",
      3L -> "big order scan")
    TextIndex.bootstrap(eng, docs)
    PhraseIndex.bootstrap(eng, docs)
    // family-wide delete through EITHER entry point
    PhraseIndex.deleteDocs(eng, Seq(1L).toDF("doc_id"))
    assert(rows(eng).map(_._2).toSet === Set(2L, 3L), "positions tombstoned")
    assert(eng.scan(TextIndex.Db, TextIndex.PostingsTable)
      .filter(col("doc_id") === 1L).count() === 0L, "postings tombstoned too")
    assert(eng.scan(TextIndex.Db, TextIndex.DoclenTable)
      .filter(col("doc_id") === 1L).count() === 0L, "doclen tombstoned too")
    assert(hits(eng, "table", "hash") === Set(2L -> 1))
    // family-wide refold: 'hash' vanishes from doc 2 in BOTH indexes
    TextIndex.refold(eng, docsOf(2L -> "table beta"))
    assert(hits(eng, "table", "hash") === Set.empty[(Long, Int)])
    assert(eng.scan(TextIndex.Db, TextIndex.PostingsTable)
      .filter(col("doc_id") === 2L && col("word") === "hash").count() === 0L)
    assert(rows(eng).filter(_._2 == 2L).map(_._1) === Set("table", "beta"))
    // the forward table holds the post-refold word sets
    assert(eng.scan(TextIndex.Db, TextIndex.FwdTable)
      .filter(col("doc_id") === 2L).select(explode(col("words")))
      .collect().map(_.getString(0)).toSet === Set("table", "beta"))
  }

  test("KWIC snippets clamp at the document head and tail and re-assemble " +
    "token order from the index alone") {
    val eng = mkEngine()
    PhraseIndex.bootstrap(eng, docsOf(
      1L -> "table hash alpha beta gamma",  // hit at 1: no left context
      2L -> "alpha beta gamma table hash",  // hit at 4: right clamped
      3L -> "alpha beta table hash gamma delta")) // full window
    val got = PhraseIndex.kwicSnippets(eng, Seq("table", "hash"), ctx = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got === Set(
      (1L, 1, "table hash alpha beta"),
      (2L, 4, "beta gamma table hash"),
      (3L, 3, "alpha beta table hash gamma delta")))
  }
}
