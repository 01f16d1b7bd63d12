package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The skew-guard contract: capping candidate buckets may only REMOVE whole
  * hot buckets — it must never perturb a bucket at or under the cap, and the
  * capped pair set must be a subset of the uncapped one. A guard that drops
  * partially (sampling) or leaks extra pairs would silently change dedup
  * semantics at exactly the corpus sizes where nobody re-checks by hand.
  */
class DedupSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("capBuckets keeps buckets <= cap intact and drops hot buckets whole") {
    import spark.implicits._
    // bucket sizes 1..5 under keys k1..k5
    val rows = for { k <- 1 to 5; i <- 1 to k } yield (s"k$k", k.toLong * 100 + i)
    val df = rows.toDF("k", "v")
    val capped = Dedup.capBuckets(df, Seq("k"), cap = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expected = rows.filter { case (k, _) => k.stripPrefix("k").toInt <= 3 }.toSet
    assert(capped == expected)
  }

  test("capBuckets falls back to a shuffle anti-join when hot keys exceed the broadcast limit") {
    import spark.implicits._
    // every key is hot (size 2 > cap 1) and the limit forces the fallback.
    // The guard's contract is to stop FORCING broadcast() (which ignores
    // autoBroadcastJoinThreshold); the planner may still choose broadcast for
    // a frame it measures as small — so disable auto-broadcast to observe the
    // guard's decision alone, the way a driver-sized hot set would at scale.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = (1 to 50).flatMap(k => Seq((s"k$k", 1L), (s"k$k", 2L))).toDF("k", "v")
      val capped = Dedup.capBuckets(df, Seq("k"), cap = 1, hotBroadcastLimit = 10L)
      assert(!capped.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
        "hot-key anti-join must not be force-broadcast past the limit")
      assert(capped.count() == 0) // all buckets hot -> all dropped
      // under the limit the guard DOES force broadcast even with auto off
      val few = Dedup.capBuckets(df, Seq("k"), cap = 1, hotBroadcastLimit = 1000L)
      assert(few.queryExecution.executedPlan.toString.contains("BroadcastExchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("capBuckets rejects a nonsensical cap") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("k", "v")
    assertThrows[IllegalArgumentException](Dedup.capBuckets(df, Seq("k"), cap = 0))
  }

  test("LSH pairs with maxBucket are a subset of the uncapped pairs") {
    val uncapped = pairs(Dedup.minhashLsh(spark, dir))
    val capped = pairs(Dedup.minhashLsh(spark, dir, maxBucket = Some(2)))
    assert(capped.subsetOf(uncapped))
    // a cap nothing exceeds reproduces the exhaustive answer exactly
    val lax = pairs(Dedup.minhashLsh(spark, dir, maxBucket = Some(1000000)))
    assert(lax == uncapped)
  }

  test("Jaccard pairs with maxBlock are a subset of the uncapped pairs") {
    val uncapped = pairs(Dedup.ngramJaccard(spark, dir))
    val capped = pairs(Dedup.ngramJaccard(spark, dir, maxBlock = Some(2)))
    assert(capped.subsetOf(uncapped))
    val lax = pairs(Dedup.ngramJaccard(spark, dir, maxBlock = Some(1000000)))
    assert(lax == uncapped)
  }

  test("skewAudit histogram accounts for every document and flags drops at the cap") {
    val audit = Dedup.skewAudit(spark, dir, cap = 2).collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(audit.map(_.getAs[Long]("n_docs")).sum == nDocs)
    val dropped = audit.filter(_.getAs[Boolean]("dropped"))
    assert(dropped.nonEmpty, "sf0.001 has blocks over the cap; audit must flag them")
    assert(dropped.forall(_.getAs[Long]("bsize") > 2))
  }
}
