package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.catalog._
import graft.engine.OlapEngine
import graft.manifest.Version
import graft.model._

/** Routed-ingest throughput probe (the BASELINE.md metric "rows/s for the
  * routed write path"): creates the canonical RANGE×4-bucket orders table,
  * ingests the driver's orders table replicated `factor`× with disjoint
  * keys, and reports rows/s for the full route→sort→parquet→publish path.
  * Usage: IngestProbe <sfDir> <factor>
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", FastTmp.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wh = Files.createTempDirectory(
      java.nio.file.Paths.get(FastTmp.dir), "ingest-probe-")
    val eng = new OlapEngine(spark, wh)
    eng.createDatabase("probe")
    eng.createTable(TableDef(
      db = "probe", name = "orders", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("o_orderkey", LongType),
        ColumnSpec.value("o_custkey", LongType),
        ColumnSpec.value("o_orderstatus", StringType),
        ColumnSpec.value("o_totalprice", DoubleType),
        ColumnSpec.value("o_orderdate", TimestampType),
        ColumnSpec.value("o_orderpriority", StringType))),
      policy = PartitionPolicy.Range,
      partitionColumn = Some("o_orderdate"),
      partitions = Seq(
        PartitionSpec("p0", upperExclusive = Some("1997-01-01"), numBuckets = 4),
        PartitionSpec("p1", upperExclusive = Some("2000-01-01"), numBuckets = 4),
        PartitionSpec("pmax", upperExclusive = None, numBuckets = 4)),
      bucketColumn = Some("o_orderkey"), numBuckets = 4))

    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val df =
      if (factor <= 1) base
      else (0 until factor).map(i =>
        base.withColumn("o_orderkey", col("o_orderkey") + lit(i * 1000000000L)))
        .reduce(_ union _)
    df.count() // warm the input in page cache so the probe times the write path

    val t0 = System.nanoTime()
    val meta = eng.ingest("probe", "orders", df, Some(Version(1, 1)))
    val sec = (System.nanoTime() - t0) / 1e9
    val rate = (meta.numRows / sec).toLong
    println(s"""{"metric":"ingest_rows_per_sec","rows":${meta.numRows},"sec":$sec,"rate":$rate,"factor":$factor,"sf":"$sfDir"}""")
    spark.stop()
  }
}
