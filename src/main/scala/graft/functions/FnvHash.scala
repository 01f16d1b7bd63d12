package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.catalog.Fnv

/** Catalyst-native FNV-1a 64-bit hash over a string column, byte-compatible
  * with the reference's bucket-routing hash (reference: src/partition.rs:30-38).
  * Implemented with `doGenCode` so it stays inside whole-stage codegen on the
  * routed-write hot path (a Scala UDF here would break the codegen span and
  * pay a UTF8String -> String copy per row).
  */
case class FnvHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fnv_hash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fnv_hash64 requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    Fnv.hash64(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("fnvBytes")
      val i = ctx.freshName("fnvI")
      val h = ctx.freshName("fnvH")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = ${Fnv.Offset}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h ^= ($bytes[$i] & 0xffL);
         |  $h *= ${Fnv.Prime}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FnvHash64 {
  /** fnv_hash64(col): Column wrapper. */
  def fnvHash64(col: Column): Column = shim.exprColumn(FnvHash64(shim.columnExpr(col)))

  /** Bucket index = unsigned(fnv_hash64(col)) mod n — the distributed form of
    * [[graft.catalog.BucketType.Hash]] routing (reference: src/partition.rs:28-38).
    */
  def fnvBucket(keyCol: Column, numBuckets: Int): Column = {
    import org.apache.spark.sql.functions._
    // Rust computes `u64 % n`: reproduce unsigned semantics on Long.
    val h = fnvHash64(keyCol)
    val n = lit(numBuckets.toLong)
    val m = pmod(h, n)
    // pmod gives h mod n on signed Long; unsigned correction: for negative h,
    // u64 value = h + 2^64; (h + 2^64) mod n == (pmod(h,n) + (2^64 mod n)) mod n.
    val twoPow64ModN = lit(java.lang.Long.remainderUnsigned(-1L, numBuckets.toLong) + 1L)
    when(h >= 0, m).otherwise(pmod(m + pmod(twoPow64ModN, n), n)).cast("int")
  }
}
