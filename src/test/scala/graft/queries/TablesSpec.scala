package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestSession

/** The events-loader choke point: every physical shape the driver's testdata
  * generator has shipped (or could ship) for `events.ts` must normalize to
  * the SAME session-UTC TimestampType value — and an unknown shape must fail
  * LOUDLY at the loader, not silently mis-read in every downstream query
  * (the rounds-3→4 regression class).
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // 2021-03-04T05:06:07.123456Z as micros since epoch
  private val micros = 1614834367123456L

  test("nanos-as-long, TIMESTAMP_NTZ, and TimestampType all normalize to the same instant") {
    import spark.implicits._
    val want = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      micros / 1000000L, (micros % 1000000L) * 1000L))

    // legacy TIMESTAMP(NANOS) surfaces as LongType nanos under nanosAsLong
    val asNanos = Seq(micros * 1000L).toDF("ts")
    assert(asNanos.select(Tables.normalizeTs(LongType)).head().getTimestamp(0) == want)

    // TIMESTAMP_NTZ (the round-4 testdata shape)
    val asNtz = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(asNtz.schema("ts").dataType == TimestampNTZType)
    assert(asNtz.select(Tables.normalizeTs(TimestampNTZType)).head().getTimestamp(0) == want)

    // already session-tz TimestampType (INT96 / adjusted-to-UTC micros land here)
    val asTs = Seq(micros).toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(asTs.schema("ts").dataType == TimestampType)
    assert(asTs.select(Tables.normalizeTs(TimestampType)).head().getTimestamp(0) == want)
  }

  test("an unrecognized ts shape fails loudly at the loader") {
    val e = intercept[IllegalStateException](Tables.normalizeTs(StringType))
    assert(e.getMessage.contains("unrecognized physical type"))
    intercept[IllegalStateException](Tables.normalizeTs(DoubleType))
  }

  test("the real events table loads as TimestampType whatever the file has") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(max(col("ts"))).head().getTimestamp(0) != null)
  }
}
