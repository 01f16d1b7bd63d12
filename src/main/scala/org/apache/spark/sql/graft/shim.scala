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
}
