package graft.operators

import org.apache.spark.sql.DataFrame

/** Map-side parallelism floor for CPU-dense stages.
  *
  * Spark's scan parallelism is bounded by parquet row groups: a single-row-
  * group file is one task no matter what `maxPartitionBytes` says, and AQE
  * can only coalesce partitions, never split them. When a stage fused to such
  * a scan does heavy per-row CPU (per-word hashing, shingle construction,
  * 60-column partial aggregation), the whole stage runs on one core.
  *
  * `widen` inserts a round-robin repartition to the session's default
  * parallelism — but ONLY when the input is under-split (fewer than half the
  * available slots). The trade is a narrow shuffle of the raw input rows in
  * exchange for full-width map CPU, which pays off exactly when per-row work
  * dominates I/O. On production data (many row groups / many files) the
  * condition never fires and the plan is untouched — so this cannot add a
  * shuffle at 100 TB, where inputs are already wide and an extra pass over
  * the data would be the bottleneck.
  */
object MapWidth {

  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}
