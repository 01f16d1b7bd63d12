package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Top 60 bits of md5(input) as a positive Long — the portable hash behind
  * SimHash word hashes and LSH hyperplane weights.
  *
  * Semantically identical to `conv(substring(md5(s), 1, 15), 16, 10)` (first
  * 15 hex chars of the digest read big-endian), which is what the DuckDB
  * oracles recompute — but evaluated straight from the 16 digest bytes:
  * no 32-char hex string materialization, no base-16 string re-parse, and a
  * thread-local reused MessageDigest. On the q32 hot path (one hash per word
  * occurrence) this is the difference between the hash being an explode-rate
  * cost and an allocation storm.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Prefix60.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix60 {

  private val localDigest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of the digest, big-endian: 7 full bytes + the high nibble
    * of byte 7 — exactly the value of the first 15 hex characters.
    */
  def hash(s: UTF8String): Long = {
    val md = localDigest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** md5_prefix60(col): Column wrapper. */
  def md5Prefix60(col: Column): Column =
    shim.exprColumn(Md5Prefix60(shim.columnExpr(col)))
}
