package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Catalyst-native dot product over two `array<double>` columns — the hot
  * inner loop of every similarity operator (brute-force/LSH/IVF ANN, embedding
  * near-dup). Spark's higher-order functions (`aggregate(zip_with(...))`)
  * express the same computation but evaluate their lambda per element through
  * the interpreter; this expression is one fused codegen'd loop over the
  * unsafe array data, with bit-identical left-to-right IEEE summation (same
  * operation order as the HOF fold, so results — and the DuckDB oracle
  * comparison — are unchanged).
  *
  * Null semantics mirror the HOF form: mismatched lengths or any null element
  * yield NULL (zip_with pads with null, null poisons the fold).
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vector_dot requires two array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  // Mismatched lengths / null elements return NULL, so the expression is
  // nullable even over non-null inputs.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("vdN")
      val i = ctx.freshName("vdI")
      val s = ctx.freshName("vdS")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** vector_dot(a, b): Column wrapper. */
  def vecDot(a: Column, b: Column): Column =
    shim.exprColumn(VectorDot(shim.columnExpr(a), shim.columnExpr(b)))
}
