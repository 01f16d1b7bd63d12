package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The warm-restart contract behind the per-(query, dir) checkpoint reuse:
  * invoking a streaming query AGAIN must return exactly the first drain's
  * result — the restart sees no new source files, runs zero batches, and
  * serves the committed sink. A regression here (sink overwritten with a
  * partial batch, checkpoint mismatch, append double-count) would poison
  * every repeat consumer while the first-run correctness gate stays green.
  */
class StreamingWarmRestartSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Set[String] =
    StreamingQueries.all(name)(spark, dir)
      .collect().map(_.toString).toSet

  for (name <- StreamingQueries.all.keys.toSeq.sorted)
    test(s"$name: second invocation equals the first drain") {
      val first = rows(name)
      assert(first.nonEmpty, s"$name drained empty")
      assert(rows(name) == first)
    }

  /** The replay-idempotency mechanism behind the foreachBatch sinks: a batch
    * that is re-executed after a mid-drain failure lands on the SAME
    * __bid=<batchId> subpath with overwrite, so re-running a batch write must
    * leave the query result byte-identical. Simulated by rewriting an
    * existing bid partition's content in place (the exact effect of a
    * checkpoint replay of that batch) and re-reading.
    */
  test("q61 bid-keyed sink: replaying a batch write leaves the result unchanged") {
    import org.apache.spark.sql.functions._
    val before = rows("q61_stream_dedup")
    // locate the cached sink via a fresh invocation's plan input files
    val df = StreamingQueries.all("q61_stream_dedup")(spark, dir)
    val files = df.queryExecution.analyzed.collectLeaves()
      .flatMap(_.collect { case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r })
      .flatMap(_.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
        .location.inputFiles)
    assert(files.nonEmpty)
    val bidDir = new java.io.File(new java.net.URI(files.head)).getParentFile
    assert(bidDir.getName.startsWith("__bid="), s"sink not bid-keyed: $bidDir")
    // replay: rewrite the same partition content (same rows, overwrite mode)
    val replay = spark.read.parquet(bidDir.toString)
    val tmp = java.nio.file.Files.createTempDirectory("graft-replay-").toString
    replay.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(bidDir.toString)
    assert(rows("q61_stream_dedup") == before)
  }

  test("clearDrains: caches evicted, queries re-drain to the same result") {
    val before = rows("q42_stream_window")
    StreamingQueries.clearDrains()
    // a fresh drain (new checkpoint + sink) must reproduce the result
    assert(rows("q42_stream_window") == before)
  }
}
