package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-string character histogram: `char_histogram(s)` → `map<string,long>`
  * of code-point → occurrence count, in first-appearance order.
  *
  * Semantically identical to exploding one row per character
  * (`explode(sequence(1, length(s)))` + `substring(s, i, 1)` + a
  * `groupBy(ch).count`) — which is what the DuckDB oracles recompute — but
  * built in ONE pass inside the row: no row-per-character materialization,
  * no (doc, char) shuffle. On a character-entropy scan this turns a
  * corpus-of-characters explode (the worst GC pressure in the suite) into a
  * map of ≤ alphabet-size entries per document, and the downstream
  * per-document math needs no shuffle at all.
  *
  * Iteration is by Unicode code point (surrogate pairs count once), matching
  * Spark's `length`/`substring` and DuckDB's character semantics.
  */
case class CharHistogram(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "char_histogram"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_histogram requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    CharHistogram.hist(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharHistogram.hist($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharHistogram {

  /** One-pass code-point histogram, first-appearance key order. */
  def hist(s: UTF8String): MapData = {
    val str = s.toString
    val m = new java.util.LinkedHashMap[String, java.lang.Long]()
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val w = Character.charCount(cp)
      val ch = str.substring(i, i + w)
      val prev = m.get(ch)
      m.put(ch, if (prev == null) 1L else prev.longValue() + 1L)
      i += w
    }
    val n = m.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = UTF8String.fromString(e.getKey)
      vals(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** char_histogram(col): Column wrapper. */
  def charHistogram(col: Column): Column =
    shim.exprColumn(CharHistogram(shim.columnExpr(col)))
}
