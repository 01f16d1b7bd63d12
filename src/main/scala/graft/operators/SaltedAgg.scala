package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated aggregation: salt the hot key space into `saltBuckets`
  * sub-keys, partially aggregate per (key, salt), then finish per key.
  *
  * Spark's partial aggregation already does this *within* a task; explicit
  * salting additionally splits one hot key's partial states across
  * `saltBuckets` different reducers, so a single key that dominates the
  * table (the classic 100 TB skew failure: one reducer runs for hours) costs
  * at most 1/saltBuckets of a reducer. AQE's skew-join handling covers joins;
  * this covers aggregations with re-aggregable functions (sum/min/max/count).
  */
object SaltedAgg {

  /** sum/count per key via a salted two-stage aggregation — results are
    * exactly equal to the direct `groupBy(key).agg(...)` for re-aggregable
    * aggregates (integer/decimal sums; double sums differ only in summation
    * order).
    */
  def sumCountBySalt(df: DataFrame, key: String, valueCol: Column,
                     saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("total"), sum(col("__pcnt")).cast("long").as("n"))
  }
}
