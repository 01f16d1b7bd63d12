package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import graft.catalog._
import graft.engine.OlapEngine
import graft.manifest.Version
import graft.model._

/** Scale probe for [[OlapEngine.cloneTable]]: wall-time vs DATA volume at
  * a fixed rowset count (must be flat — the clone copies no bytes), and vs
  * ROWSET count at fixed data volume (must be linear in metadata — one
  * manifest entry per borrowed rowset). Together the two axes are the
  * measured form of the clone's O(rowsets)-not-O(bytes) claim: at 100 TB a
  * clone costs the same manifest write a 100 MB clone costs. BASELINE.md
  * records the table.
  *
  * Each cell builds a fresh engine with `nRowsets` loads of `nRows` total
  * synthetic rows, then times 3 clones (into distinct names; each clone is
  * an independent manifest write) and reports the median.
  */
object CloneProbe {

  private def timeIt[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def build(spark: SparkSession, nRows: Long, nRowsets: Int): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-cloneprobe-"))
    eng.createDatabase("db")
    eng.createTable(TableDef(
      db = "db", name = "t", schema = TableSchema(KeysType.Duplicate, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = 4))
    val per = nRows / nRowsets
    (0 until nRowsets).foreach { i =>
      val df = spark.range(i * per, (i + 1) * per)
        .selectExpr("id AS k", "id * 7 AS v")
      eng.ingest("db", "t", df, Some(Version(i.toLong, i.toLong)))
    }
    eng
  }

  private def cell(spark: SparkSession, nRows: Long, nRowsets: Int): Double = {
    val eng = build(spark, nRows, nRowsets)
    val times = (0 until 3).map { i =>
      timeIt(eng.cloneTable("db", "t", "db", s"c$i"))
    }.sorted
    val med = times(1)
    println(f"[cloneprobe] rows=$nRows%-9d rowsets=$nRowsets%-3d " +
      f"clone=${med}%.4f s (runs: ${times.map(t => f"$t%.4f").mkString(", ")})")
    med
  }

  def main(args: Array[String]): Unit = {
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

    println("[cloneprobe] axis 1: data volume at fixed 4 rowsets (expect FLAT)")
    Seq(100000L, 1000000L, 10000000L).foreach(n => cell(spark, n, 4))
    println("[cloneprobe] axis 2: rowset count at fixed 1M rows (expect linear-in-metadata)")
    Seq(4, 16, 64).foreach(r => cell(spark, 1000000L, r))
    spark.stop()
  }
}
