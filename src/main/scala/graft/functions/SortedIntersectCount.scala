package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `sorted_intersect_count(a, b)` — |a ∩ b| for two LEXICOGRAPHICALLY
  * SORTED, duplicate-free string arrays, by a two-pointer merge.
  *
  * Semantically `size(array_intersect(a, b))` under those preconditions —
  * which is what the similarity-join verify stages (q171/q255 prefix
  * filter, q260 containment) compute per CANDIDATE PAIR. Spark's
  * `array_intersect` builds a hash set and an output array per row; on a
  * pair-quadratic verify stage that is the dominant allocation. The merge
  * needs zero allocation and only byte comparisons, and we never wanted
  * the intersection's elements — just its size.
  *
  * The preconditions are the CALLER's contract (the verify stages sort
  * with `sort_array` over `array_distinct` tokens); they are not checked
  * row-wise — an unsorted input silently undercounts, exactly like any
  * merge-join fed unsorted input.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<string> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Two-pointer merge count over sorted UTF8String arrays (binary order —
    * the same order `sort_array` produces for StringType).
    */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      // the expression is general-purpose (inputs may be array<string>
      // with containsNull=true even though current callers never produce
      // null elements): skip nulls rather than NPE on compareTo. sort_array
      // places nulls first, so skipping from the front preserves the merge.
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      val c = x.compareTo(y)
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
      }
    }
    n
  }

  /** sorted_intersect_count(a, b): Column wrapper. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    shim.exprColumn(SortedIntersectCount(shim.columnExpr(a), shim.columnExpr(b)))
}
