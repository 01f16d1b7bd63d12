package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Table loaders. `events.parquet` is written with TIMESTAMP(NANOS), which
  * Spark's Parquet reader rejects (TimestampType is microseconds); we read
  * nanos as raw longs (`spark.sql.legacy.parquet.nanosAsLong`) and convert
  * with exact integer division (the data is micro-aligned; a double division
  * would lose precision above 2^53 nanos).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Raw nanos-as-long schema for the streaming file source (it needs an
    * explicit schema; conversion happens after `readStream`).
    */
  def eventsRawSchema(spark: SparkSession, dir: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val s = spark.read.parquet(s"$dir/events.parquet").schema
    StructType(s.map(f => if (f.name == "ts") f.copy(dataType = LongType) else f))
  }

  /** The file stream source requires a *directory*; expose the single
    * events.parquet through a symlinked temp dir.
    */
  def eventsStreamDir(dir: String): String = {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-events-stream-")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    streamDir.toString
  }

  def eventsStreamFrom(spark: SparkSession, streamDir: String, schemaDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsRawSchema(spark, schemaDir))
      .parquet(streamDir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    eventsStreamFrom(spark, eventsStreamDir(dir), dir)
}
