package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Histogram quantile sketch: merge law (the property that lets it live in
  * an Aggregate-model table), bounded error vs exact percentiles, and
  * negative-value bins.
  */
class QuantileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("Sum-merged partial histograms equal the whole-corpus histogram") {
    val vals = (0 until 1000).map(i => ((i * 37) % 500).toDouble - 50.0)
    val df = vals.toDF("v")
    val (a, b) = (df.filter($"v" < 100.0), df.filter($"v" >= 100.0))
    val merged = Quantile.histCells(a, "v", 0.0, 5.0)
      .unionByName(Quantile.histCells(b, "v", 0.0, 5.0))
      .groupBy("bin").agg(sum("n").as("n"))
    val whole = Quantile.histCells(df, "v", 0.0, 5.0)
    assert(merged.orderBy("bin").collect().toSeq ==
      whole.orderBy("bin").collect().toSeq)
    // negative values land in negative bins, no clamping
    assert(whole.filter($"bin" < 0).agg(sum("n")).head.getLong(0) ==
      vals.count(_ < 0).toLong)
  }

  test("percentile estimates are within one bin width of exact") {
    val vals = (1 to 2000).map(i => math.pow(i.toDouble, 1.3) % 400.0)
    val df = vals.toDF("v")
    val width = 4.0
    val qs = Seq(0.1, 0.5, 0.9, 0.99, 1.0)
    val est = Quantile.percentileFromHist(
      Quantile.histCells(df, "v", 0.0, width), 0.0, width, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val exact = sorted(math.ceil(q * vals.size).toInt - 1)
      assert(math.abs(est(q) - exact) <= width,
        s"q=$q est=${est(q)} exact=$exact width=$width")
    }
  }
}
