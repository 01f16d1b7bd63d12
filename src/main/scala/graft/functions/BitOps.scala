package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
import org.apache.spark.sql.graft.shim

/** Variable-amount bit shifts. Spark's `functions.shiftleft/shiftright` only
  * accept a literal Int amount; the underlying Catalyst expressions take any
  * expression, which we need inside higher-order-function lambdas (SimHash
  * builds 64 bit positions from a `sequence()` column). Wrapping the Catalyst
  * nodes keeps everything codegen'd — no UDF.
  */
object BitOps {
  def varShiftRight(v: Column, amount: Column): Column =
    shim.exprColumn(ShiftRight(shim.columnExpr(v), shim.columnExpr(amount)))
  def varShiftLeft(v: Column, amount: Column): Column =
    shim.exprColumn(ShiftLeft(shim.columnExpr(v), shim.columnExpr(amount)))
}
