package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the driver's t1 smoke: the flagship entry query must return rows. */
class EntrySpec extends AnyFunSuite {
  test("entry returns rows on sf0.001") {
    val df = SparkEntry.entry(SparkTestSession.spark)
    assert(df.count() > 0)
  }

  test("every query has an oracle entry — no rows-only rows") {
    // The four ops whose core computation is not SQL-expressible (IVF
    // k-means, sketch internals) surface their accuracy CONTRACTS as
    // oracle-pinned verdict columns instead, so the driver hash-checks
    // every single query.
    assert((SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).isEmpty)
    // and no oracle refers to a non-existent query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("bench variants shadow real query keys and run") {
    // a typo'd key here would silently bench the verdict form again
    assert((SparkEntry.benchVariants.keySet -- SparkEntry.queries.keySet).isEmpty)
    SparkEntry.benchVariants.foreach { case (name, fn) =>
      assert(fn(SparkTestSession.spark, "/root/testdata/sf0.001").count() > 0, name)
    }
  }
}
