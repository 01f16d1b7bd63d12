package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("salted aggregation equals direct aggregation (skewed key)") {
    import spark.implicits._
    // 10k rows on one hot key + a tail of normal keys
    val df = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("key", "v")
    val direct = df.groupBy($"key")
      .agg(sum($"v").as("total"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    val salted = SaltedAgg.sumCountBySalt(df, "key", col("v"), 8)
      .as[(String, Long, Long)].collect().toSet
    assert(salted == direct)
  }

  test("salted join equals direct join (skewed key), each row matched exactly once") {
    import spark.implicits._
    val big = ((1 to 5000).map(_ => (1L, 1.0)) ++
      (1 to 200).map(i => (i.toLong % 20, 2.0))).toDF("bk", "v")
    val small = (0L to 20L).map(k => (k, s"dim$k")).toDF("sk", "name")
    val direct = big.join(small, $"bk" === $"sk")
      .groupBy($"name").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(String, Long, Double)].collect().toSet
    val salted = SaltedJoin.join(big, small, "bk", "sk", 8)
      .groupBy($"name").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(String, Long, Double)].collect().toSet
    assert(salted == direct)
  }

  test("as-of join picks the latest earlier build row, inclusive on ties") {
    import spark.implicits._
    val probe = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("uid", "t", "pid")
    val build = Seq((1L, 100L, "b_at_100"), (1L, 150L, "b_at_150"), (3L, 10L, "other"))
      .toDF("uid", "t", "bid")
    val got = AsOfJoin.asOf(
      probe.select($"uid", $"t", $"pid"),
      build.select($"uid", $"t", $"bid"),
      key = "uid", time = "t", buildCols = Seq("bid"))
      .select($"pid", $"asof_bid").as[(String, String)].collect().toMap
    assert(got == Map(
      "p1" -> "b_at_100", // equal timestamp counts (inclusive)
      "p2" -> "b_at_150", // latest earlier
      "p3" -> null))      // no build row for uid=2
  }
}
