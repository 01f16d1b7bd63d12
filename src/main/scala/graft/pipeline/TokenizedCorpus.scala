package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One tokenized view of the `documents` corpus, shared across the whole
  * text-analysis family (token counts, repetition, TF-IDF, bigram quality,
  * vocabulary coverage, BPE serving, source drift, …).
  *
  * Every member of that family starts from the SAME normalization —
  * `split(trim(lower(text)), "\s+")` — and before this cache each query
  * re-read the parquet and re-split the corpus from scratch, so the family
  * paid the tokenize CPU once per query instead of once per corpus. This is
  * the [[Dedup]] `indexCache` pattern applied to the tokenize pass: the
  * corpus-with-token-array frame persists per dir (MEMORY_AND_DISK — spills
  * rather than OOMs) and each query plans on top of it.
  *
  * At 100 TB the same idea is a materialized tokenized table written once
  * per corpus rev and read by every downstream job — "tokenize once, reuse
  * everywhere" is the production shape either way; a per-executor cache is
  * its single-JVM expression. Queries whose normalization differs (e.g.
  * `trim`-only whitespace counts) keep their own expressions — this cache
  * only serves the shared-normalization majority.
  */
object TokenizedCorpus {

  /** The pre-split token array column appended to `documents`. */
  val TokCol = "toks"

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** `documents.parquet` with [[TokCol]] appended, persisted per dir. */
  def withTokens(spark: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate(dir, {
      val df = spark.read.parquet(s"$dir/documents.parquet")
        .withColumn(TokCol, split(trim(lower(col("text"))), "\\s+"))
        .persist()
      df.count()
      df
    })

  /** Token-array column for ANY documents frame: reuses the pre-split
    * [[TokCol]] when the frame carries one (served from this cache), else
    * splits inline with the ONE shared normalization. Every consumer that
    * accepts arbitrary (doc_id, text) frames goes through here, so the
    * normalization cannot fork between the cache and the inline fallback.
    */
  def tokensOrSplit(df: DataFrame): org.apache.spark.sql.Column =
    if (df.columns.contains(TokCol)) col(TokCol)
    else split(trim(lower(col("text"))), "\\s+")

  /** Fixture hook (the streaming `clearDrains` analogue): drop every cached
    * frame and unpersist its blocks — needed whenever the data under a
    * previously tokenized dir is regenerated in the same JVM.
    */
  def clearCaches(): Unit = {
    cache.values.foreach(df => { df.unpersist(); () })
    cache.clear()
  }
}
