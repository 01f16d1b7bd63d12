package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.FnvHash64

/** SQL-side integration. Two ways to get the engine's functions into SQL:
  *
  *  1. At session build (spark-submit):
  *     `--conf spark.sql.extensions=graft.GraftExtensions`
  *  2. At runtime on an existing session: `GraftExtensions.register(spark)`.
  *
  * Currently registers `fnv_hash64(str)` — the reference's bucket-routing
  * hash (src/partition.rs:30-38) — so SQL users can compute/inspect bucket
  * placement: `SELECT fnv_hash64(o_orderkey) % 4 FROM orders`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction(GraftExtensions.fnvFunction)
}

object GraftExtensions {
  private val fnvFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("fnv_hash64"),
    new ExpressionInfo(classOf[FnvHash64].getName, "fnv_hash64"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "fnv_hash64 takes exactly one argument")
      FnvHash64(children.head)
    })

  /** Register the functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.shim.functionRegistry(spark)
      .registerFunction(fnvFunction._1, fnvFunction._2, fnvFunction._3)
}
