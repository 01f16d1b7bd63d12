package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The streaming dynamic-partition lifecycle (q192): every micro-batch
  * self-extends the ladder, publishes one rowset version, and expires all
  * but the newest 12 partitions — and the drained result must be exactly
  * what ONE batch load of the same rows leaves (q188's fixture).
  */
class StreamDynPartitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def layout(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("streamed lifecycle ≡ one batch load: surviving layout matches " +
    "q188's fixture exactly") {
    val streamed = layout(StreamingQueries.streamDynamicPartitions(spark, dir))
    val batch = layout(graft.queries.EngineQueries.all("q188_partition_expiry")(spark, dir))
    assert(streamed === batch)
    assert(streamed.size <= 12 + 1) // newest 12 (+p0 only if it survives)
  }

  test("q201 streamed dead letter ≡ batch late-load quarantine: content " +
    "matches q199's fixture, the main table is untouched by the late band, " +
    "and the stream survived the poison batch") {
    val streamed = layout(StreamingQueries.streamDeadLetter(spark, dir))
    val batch = layout(graft.queries.EngineQueries.all(
      "q199_dead_letter_quarantine")(spark, dir))
    assert(streamed === batch)
    // main table = exactly the surviving live rows (no late leak-in): its
    // head scan matches the stream-WITHOUT-dead-letter engine's head scan
    val dlqMain = StreamingQueries.streamDlqEngineFor(spark, dir)
      .scan("graft", "orders_dlq").count()
    val plainMain = StreamingQueries.streamDynEngineFor(spark, dir)
      .scan("graft", "orders_dyn").count()
    assert(dlqMain === plainMain)
  }

  test("expiry under streaming is versions, not deletion: the first " +
    "micro-batch's rows — including later-expired months — are still " +
    "time-travel visible at version 1") {
    val e = StreamingQueries.streamDynEngineFor(spark, dir)
    val batch1 = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderdate") >= "1999-12-01" &&
        col("o_orderdate") < "2000-07-01")
      .count()
    val v1 = e.manifest("graft", "orders_dyn")
      .visibleRowsets.map(_.version.start).min
    assert(e.snapshot("graft", "orders_dyn", v1, v1).count() === batch1)
    // and the head scan masks the expired months: fewer rows than loaded
    val loaded = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderdate") >= "1999-12-01").count()
    assert(e.scan("graft", "orders_dyn").count() < loaded)
  }
}
