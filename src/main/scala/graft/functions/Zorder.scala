package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleave of the low 32 bits of two BIGINT columns:
  * bit i of `left` lands at output bit 2i, bit i of `right` at 2i+1.
  *
  * This is the multi-dimensional clustering key the reference's single-column
  * short-key sort (src/index/mod.rs:114-147) cannot express: sorting a table
  * by `zorder64(a, b)` makes parquet row-group min/max stats selective on
  * BOTH a and b simultaneously, so either predicate prunes — the standard
  * layout lever (Delta/Iceberg OPTIMIZE ZORDER) for 100 TB tables queried on
  * more than one dimension. The bit-spread uses the classic
  * shift-and-mask magic constants, identical in eval and codegen.
  *
  * The arithmetic is pure integer bit math, so any engine with shifts and
  * masks reproduces it exactly — the DuckDB oracle recomputes the same
  * spread chain in SQL.
  */
case class ZorderInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder64"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"zorder64 requires two bigint arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    Zorder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Zorder.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Zorder {
  /** Spread the low 32 bits of x so bit i moves to bit 2i (standard
    * bit-twiddling shift-and-mask chain).
    */
  def spread(x0: Long): Long = {
    var x = x0 & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** zorder64(a, b): Column wrapper. */
  def zorder64(a: Column, b: Column): Column =
    shim.exprColumn(ZorderInterleave(shim.columnExpr(a), shim.columnExpr(b)))
}
