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

  private val rawSchemaCache =
    scala.collection.concurrent.TrieMap.empty[String, StructType]
  private val streamDirCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Raw nanos-as-long schema for the streaming file source (it needs an
    * explicit schema; conversion happens after `readStream`). Cached per dir —
    * the footer read is per-process fixture setup, not part of any query.
    */
  def eventsRawSchema(spark: SparkSession, dir: String): StructType =
    rawSchemaCache.getOrElseUpdate(dir, {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val s = spark.read.parquet(s"$dir/events.parquet").schema
      StructType(s.map(f => if (f.name == "ts") f.copy(dataType = LongType) else f))
    })

  /** The file stream source requires a *directory*; expose the single
    * events.parquet through a symlinked temp dir. Cached per dir (layout
    * setup, like q104's lateLayoutCache) — the source lists it fresh per
    * query, so sharing the dir is safe.
    */
  def eventsStreamDir(dir: String): String =
    streamDirCache.getOrElseUpdate(dir, {
      val streamDir = java.nio.file.Files.createTempDirectory("graft-events-stream-")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      streamDir.toString
    })

  def eventsStreamFrom(spark: SparkSession, streamDir: String, schemaDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsRawSchema(spark, schemaDir))
      .parquet(streamDir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    eventsStreamFrom(spark, eventsStreamDir(dir), dir)
}
