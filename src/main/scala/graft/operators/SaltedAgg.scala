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

/** Skew-mitigated shuffle join: salt the big side's rows into `saltBuckets`
  * sub-keys and replicate each small-side row once per salt, so one hot join
  * key's rows spread over `saltBuckets` reducers instead of serializing on
  * one. The classic remedy when the small side is too big to broadcast but a
  * handful of keys dominate the big side (AQE's skew-join split covers many
  * cases post-hoc; explicit salting bounds the skew by construction).
  * Results are exactly the inner equi-join — every big row joins its
  * matching small rows exactly once (its single salt value).
  */
object SaltedJoin {
  def join(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
           saltBuckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(col(bigKey), monotonically_increasing_id()), lit(saltBuckets)))
    val replicatedSmall = small.withColumn("__ssalt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__ssalt"))
      .drop("__salt", "__ssalt")
  }
}
