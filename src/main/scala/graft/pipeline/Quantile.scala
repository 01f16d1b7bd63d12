package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable QUANTILE sketch as engine data: a fixed-boundary histogram
  * whose cells are (bin, count) rows — the missing member of the sketch
  * family beside Count-Min (frequency, q169/q179/q184), HLL (distinct), and
  * bitmap. Because the cells are plain Sum-mergeable counts, the histogram
  * lives naturally in an Aggregate-model engine table: loads carry partial
  * histograms, merge-on-read (or compaction) IS the sketch union, and a
  * percentile query reads the merged cells — never the raw values. The
  * approximation contract is explicit: any percentile estimate is within
  * one `width` of an exact answer (the value is pinned inside its bin).
  *
  * Scale posture: a load's cells are `groupBy(bin)` — partial aggregation
  * caps the mapper output at the bin count regardless of input rows, and
  * the finished histogram is bins-sized (a few KB), so the percentile walk
  * can run in one partition without ever seeing data-sized input — the
  * same trade the Count-Min probe makes (Frequency.cmsProbe).
  */
object Quantile {

  /** One load's histogram cells for `valueCol`: `(bin BIGINT, n BIGINT)`
    * with `bin = floor((value - lo) / width)`. Unbounded on both sides
    * (negative bins are fine), so the replayed oracle needs no clamping.
    * Nulls carry no quantile information and are dropped.
    */
  def histCells(df: DataFrame, valueCol: String, lo: Double, width: Double): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(floor((col(valueCol) - lit(lo)) / lit(width)).cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))

  /** Percentile estimates from merged histogram cells: for each `q` in
    * `qs` (0 < q ≤ 1), rank `target = ceil(q * total)` lands in the first
    * bin whose cumulative count reaches it, and the estimate interpolates
    * linearly inside that bin — deterministic, replayable SQL (the oracle
    * recomputes cells AND estimates bit-for-bit), error ≤ `width`.
    *
    * The cumulative walk is a single-partition window over bins-sized
    * input — sketch-sized by construction, labeled as such (never data).
    */
  def percentileFromHist(cells: DataFrame, lo: Double, width: Double,
      qs: Seq[Double]): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val total = cells.agg(sum(col("n")).as("total"))
    val walked = cells.crossJoin(broadcast(total))
      .withColumn("cum", sum(col("n")).over(Window.orderBy(col("bin"))))
    val est: Column =
      (lit(lo) + col("bin").cast("double") * lit(width)) +
        lit(width) * ((col("target") - (col("cum") - col("n"))).cast("double") /
          col("n").cast("double"))
    walked.crossJoin(broadcast(qs.toDF("q")))
      .withColumn("target", ceil(col("q") * col("total")).cast("long"))
      .filter(col("cum") >= col("target") &&
        (col("cum") - col("n")) < col("target"))
      .select(col("q"), est.as("est"))
  }
}
