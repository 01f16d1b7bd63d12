/** Small access shim: Spark 4 made `Column <-> Expression` conversion
  * `private[sql]` (org.apache.spark.sql.classic.ClassicConversions /
  * ColumnConversions). Like other open-source Spark libraries, we place one
  * tiny file inside the `org.apache.spark.sql` package to bridge our Catalyst
  * expressions into public `Column`s. Nothing else in the codebase lives in
  * Spark's namespace.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ClassicConversions, ColumnConversions}

object shim {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def exprColumn(e: Expression): Column =
    ClassicConversions.ColumnConstructorExt(Column).apply(e)

  /** Extract the resolved Catalyst expression from a Column. */
  def columnExpr(c: Column): Expression = ColumnConversions.expression(c)

  /** The session's function registry (private[sql] in Spark 4); used to
    * register engine functions for SQL callers at runtime.
    */
  def functionRegistry(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ClassicConversions.castToImpl(spark).sessionState.functionRegistry

  /** Build a DataFrame over a raw logical plan (private[sql] in Spark 4);
    * used by the SQL front door to run delegated plans after splicing
    * engine-table relations in.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      ClassicConversions.castToImpl(spark), plan)

  /** A DataFrame over a pre-partitioned InternalRow RDD that DECLARES its
    * hash partitioning to the planner (`LogicalRDD` with an explicit
    * `outputPartitioning` — the same mechanism `Dataset.checkpoint` uses to
    * preserve partitioning). The caller guarantees the physical layout:
    * partition i must hold exactly the rows whose `partitionCols` hash to i
    * under ONE consistent function on both sides of any subsequent join.
    * Used by the engine's colocate join.
    */
  def partitionedFrame(
      spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      partitionCols: Seq[String],
      numPartitions: Int): org.apache.spark.sql.DataFrame = {
    val impl = ClassicConversions.castToImpl(spark)
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)
    val part = org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(
      partitionCols.map(c => attrs.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"no column $c in ${schema.simpleString}"))),
      numPartitions)
    org.apache.spark.sql.classic.Dataset.ofRows(impl,
      org.apache.spark.sql.execution.LogicalRDD(attrs, rdd, part)(impl))
  }
}
