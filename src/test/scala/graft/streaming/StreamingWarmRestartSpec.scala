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
}
