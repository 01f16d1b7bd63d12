package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkTestSession

/** Zero-corpus-scan plan assertions for the index-served retrieval family
  * (round-11 verdict task 7): the whole point of the served forms
  * (q190/q203/q265, q200/q207's production variants) is that the corpus is
  * touched only through the maintained engine tables. A regression that
  * silently falls back to re-reading `documents.parquet` would stay
  * CORRECT (the serves equal the recompute) and only show as a bench drift
  * — these specs make it fail fast instead.
  */
class ServedPlanSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark; graft.GraftExtensions.register(s); s
  }
  private val dir = "/root/testdata/sf0.001"

  /** The physical plan must not contain a scan of the given fixture file.
    * (Engine-table scans are parquet too, but under the engine's temp
    * warehouse — only the corpus file itself is banned.)
    */
  private def assertNoScanOf(df: DataFrame, file: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains(file),
      s"served plan rescans $file:\n${plan.take(2000)}")
  }

  test("q190 served BM25 plan never scans documents.parquet") {
    val eng = graft.pipeline.TextIndex.engineFor(spark, dir)
    assertNoScanOf(graft.pipeline.TextIndex.bm25FromTable(eng),
      "documents.parquet")
  }

  test("q265 served RM3 plan never scans documents.parquet") {
    val eng = graft.pipeline.TextIndex.engineFor(spark, dir)
    assertNoScanOf(graft.pipeline.TextIndex.rm3FromTable(eng),
      "documents.parquet")
  }

  test("q200 served hybrid fusion plan never scans documents.parquet") {
    assertNoScanOf(graft.pipeline.Retrieval.hybridRrfServed(spark, dir),
      "documents.parquet")
  }

  test("q207 served context pack plan never scans documents.parquet") {
    assertNoScanOf(
      graft.pipeline.Retrieval.contextPack(spark, dir, served = true),
      "documents.parquet")
  }

  test("q268 table-served token counts plan never scans documents.parquet") {
    assertNoScanOf(
      graft.pipeline.TokenizedCorpus.tokenCountsServed(spark, dir),
      "documents.parquet")
  }

  test("q202 served filtered ANN probes embeddings with a pushed probe filter") {
    // the ANN family's corpus is embeddings.parquet; the served plan may
    // read it ONLY for the probe slice (vec_id < nProbes pushed to the
    // scan), never as an exhaustive ranking side
    val df = graft.pipeline.AnnIndex.filteredAnnServed(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains("embeddings.parquet")).toSeq
    assert(scans.nonEmpty)
    assert(plan.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id"),
      s"embeddings scan lost its probe pushdown:\n${plan.take(2000)}")
  }
}
