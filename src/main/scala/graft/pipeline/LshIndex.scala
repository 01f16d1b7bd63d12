package graft.pipeline

import java.nio.file.Files
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog._
import graft.engine.OlapEngine
import graft.manifest.Version
import graft.model._

/** Maintained MinHash-LSH index as ENGINE TABLES — the cross-JVM production
  * form of [[Dedup]]'s per-JVM signature caches (the [[ClusterReps]] /
  * [[TokenizedCorpus]] doctrine applied to the last cachedDf family):
  *
  *  - `graft_idx.minhash_bands` (Unique, (doc_id, band) → bh): the banded
  *    signature rows the candidate self-join buckets on;
  *  - `graft_idx.shingle_sets` (Unique, doc_id → sorted shingle array):
  *    the verify stage's input.
  *
  * Signatures are PER-DOCUMENT pure maps, so incremental maintenance is
  * trivial by construction: folding a delta batch is one tokenize+hash pass
  * over the delta upserted through the engine's ordinary Unique path (both
  * tables under ONE load group, so no reader ever sees bands without their
  * shingle sets). A restarted JVM serves candidates + verify from the
  * tables with zero re-hashing of the corpus — at 100 TB the signature
  * build runs once per corpus revision, not once per job.
  *
  * Query half ([[Dedup.lshPairs]]) is ONE definition shared with the
  * cached path, so q271's table serve must equal q31's recompute
  * bit-for-bit — and both carry q31's exhaustive-Jaccard oracle.
  */
object LshIndex {

  val Db = "graft_idx"
  val BandsTable = "minhash_bands"
  val ShinglesTable = "shingle_sets"

  val K = 3
  val Bands = 8
  val RowsPerBand = 4

  private val cache = TrieMap.empty[String, OlapEngine]
  private def deleteWarehouse(e: OlapEngine): Unit = {
    def del(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(del)); f.delete(); ()
    }
    del(e.warehouse.toFile)
  }
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      cache.values.foreach(deleteWarehouse)))
  }

  def clearCaches(): Unit = {
    cache.values.foreach(deleteWarehouse)
    cache.clear()
  }

  def createTables(eng: OlapEngine): Unit = {
    eng.createDatabase(Db)
    eng.createTable(TableDef(
      db = Db, name = BandsTable,
      schema = TableSchema(KeysType.Unique, Seq(
        ColumnSpec.key("doc_id", LongType),
        ColumnSpec.key("band", IntegerType),
        ColumnSpec.value("bh", LongType))),
      bucketColumn = Some("doc_id"), numBuckets = 4))
    eng.createTable(TableDef(
      db = Db, name = ShinglesTable,
      schema = TableSchema(KeysType.Unique, Seq(
        ColumnSpec.key("doc_id", LongType),
        ColumnSpec.value("sh", ArrayType(StringType)))),
      bucketColumn = Some("doc_id"), numBuckets = 4))
  }

  /** Fold one batch: signature + shingle rows for the batch's documents,
    * committed to both tables atomically (one load group).
    */
  def fold(eng: OlapEngine, batch: DataFrame): Unit = {
    val b = batch.localCheckpoint(true)
    if (b.isEmpty) return
    val bands = Dedup.bandedSignatures(b, K, Bands, RowsPerBand)
      .select(col("doc_id"), col("band").cast("int").as("band"), col("bh"))
    val sh = Dedup.sortedShingles(b, K)
    val g = eng.newLoadGroup()
    def nextV(t: String) = { val v = eng.manifest(Db, t).maxVersion + 1; Version(v, v) }
    eng.ingest(Db, BandsTable, bands, Some(nextV(BandsTable)), group = Some(g))
    eng.ingest(Db, ShinglesTable, sh, Some(nextV(ShinglesTable)), group = Some(g))
    eng.commitGroup(g)
  }

  /** Driver fixture: bootstrap on 90% of the corpus, fold the q123 delta
    * in, then the scheduled compaction — the served tables' content is
    * reached through both maintenance paths plus the rewrite.
    */
  def engineFor(spark: SparkSession, dir: String): OlapEngine =
    cache.getOrElseUpdate(dir, {
      val eng = new OlapEngine(spark, Files.createTempDirectory("graft-lshidx-"))
      createTables(eng)
      val d = spark.read.parquet(s"$dir/documents.parquet")
      fold(eng, d.filter(col("doc_id") % 10 =!= 0))
      fold(eng, d.filter(col("doc_id") % 10 === 0))
      eng.runScheduledCompaction()
      eng
    })

  /** q271: q31's near-dup pairs SERVED from the maintained tables — the
    * candidate bucket join reads `minhash_bands`, the verify reads
    * `shingle_sets`; zero re-hashing of the corpus.
    */
  def nearDupFromTable(spark: SparkSession, dir: String,
                       threshold: Double = 0.5,
                       maxBucket: Option[Int] = None): DataFrame = {
    val eng = engineFor(spark, dir)
    Dedup.lshPairs(
      eng.scan(Db, BandsTable),
      eng.scan(Db, ShinglesTable),
      threshold, maxBucket)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q271_lsh_index_served" ->
      ((s: SparkSession, d: String) => nearDupFromTable(s, d)),
  )

  val oracles: Map[String, String] = Map(
    // q31's oracle VERBATIM (exhaustive-equivalent Jaccard): one answer,
    // two derivations — in-JVM signature cache vs maintained engine tables
    "q271_lsh_index_served" -> Dedup.minhashOracleSql,
  )
}
