package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** TopKAgg laws: agreement with sort-take-k under arbitrary reduce/merge
  * splits (the commutative-semigroup contract Spark assumes of partial
  * aggregates), window equivalence on real data, and the map-side partial
  * aggregation the operator exists for.
  */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("aggregator equals sort-take-k under random merge trees") {
    val rnd = new scala.util.Random(5)
    val agg = new TopKAgg(4)
    for (trial <- 0 until 30) {
      val rows = (0 until rnd.nextInt(40)).map(i =>
        TopKIn(rnd.nextInt(10).toDouble, i.toLong)) // heavy ties on ord
      val expected = rows.sortWith((a, b) =>
        a.ord > b.ord || (a.ord == b.ord && a.id < b.id)).take(4)
      // arbitrary partitioning into partial buffers, then arbitrary merges
      val parts = rows.grouped(rnd.nextInt(5) + 1).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = parts.foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == expected, s"trial=$trial")
      // merge in reverse order must agree too
      val mergedRev = parts.reverse.foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(mergedRev) == expected, s"trial=$trial (reversed)")
    }
  }

  test("q163 equals the window formulation; plan partial-aggregates before the exchange") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val viaAgg = TopK.topKPerGroup(spark, dir)
      .as[(String, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("o_orderpriority"), col("rk").cast("long"), col("o_orderkey"))
      .as[(String, Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
    // the whole point: a partial ObjectHashAggregate runs BEFORE the shuffle
    val plan = TopK.topKPerGroup(spark, dir).queryExecution.executedPlan.toString
    val exchangeIdx = plan.indexOf("Exchange")
    val partialIdx = plan.indexOf("partial_topkagg")
    assert(partialIdx >= 0, s"no partial aggregation in plan:\n$plan")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      "partial top-k must appear below (after in tree-print order) the exchange")
  }
}
