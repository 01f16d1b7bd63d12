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
    // Only ops whose core computation is not SQL-expressible stay rows-only:
    // the IVF k-means fit, the HLL/quantile sketch internals, and the two
    // DataSketches-HLL surfaces (approximate by definition; their accuracy
    // contracts live in EngineSpec). Everything else (incl. FNV routing,
    // LSH, SimHash) is oracle-recomputed in DuckDB.
    assert(rowsOnly == Set("q50_ann_ivf_topk", "q51_sketches",
      "q131_hll_distinct", "q134_hll_column"))
    // and no oracle refers to a non-existent query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
