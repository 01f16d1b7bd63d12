package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the driver's t1 smoke: the flagship entry query must return rows. */
class EntrySpec extends AnyFunSuite {
  test("entry returns rows on sf0.001") {
    val df = SparkEntry.entry(SparkTestSession.spark)
    assert(df.count() > 0)
  }

  test("every query has either an oracle or is a documented rows-only op") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // hash-family / model-specific operators without a SQL-expressible oracle
    assert(rowsOnly == Set("q26_engine_bucket_layout",
      "q32_dedup_simhash", "q35_ann_lsh_topk", "q36_embed_near_dup",
      "q50_ann_ivf_topk", "q51_sketches"))
    // and no oracle refers to a non-existent query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
