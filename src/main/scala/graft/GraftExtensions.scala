package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{FnvHash64, Md5Prefix60, VectorDot, ZorderInterleave}

/** SQL-side integration. Two ways to get the engine's functions into SQL:
  *
  *  1. At session build (spark-submit):
  *     `--conf spark.sql.extensions=graft.GraftExtensions`
  *  2. At runtime on an existing session: `GraftExtensions.register(spark)`.
  *
  * Registers:
  *  - `fnv_hash64(str)` — the reference's bucket-routing hash
  *    (src/partition.rs:30-38), so SQL users can compute/inspect bucket
  *    placement: `SELECT fnv_hash64(o_orderkey) % 4 FROM orders`.
  *  - `vector_dot(arr, arr)` — codegen'd dot product over `array<double>`,
  *    the similarity-search kernel: `SELECT vector_dot(embedding, embedding)`.
  *  - `md5_prefix60(str)` — top 60 bits of md5 as a positive BIGINT, the
  *    portable hash behind SimHash/LSH (recomputable in any engine with md5).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => graft.plans.RollupRewrite)
    e.injectOptimizerRule(_ => graft.plans.JoinMvRewrite)
    e.injectOptimizerRule(_ => graft.plans.BucketPruneRewrite)
    e.injectOptimizerRule(_ => graft.plans.PartitionPruneRewrite)
    e.injectOptimizerRule(_ => graft.plans.RowsetPruneRewrite)
    e.injectOptimizerRule(_ => graft.plans.StatsAggRewrite)
    e.injectOptimizerRule(_ => graft.plans.StatsBroadcastRewrite)
    // SQL front door: engine DDL/DML/lifecycle statements become Spark SQL
    // (inert until an engine is bound via GraftSql.bind — unclaimed text
    // always delegates to Spark's own parser)
    e.injectParser((_, delegate) => new graft.sql.GraftSqlParserInterface(delegate))
  }
}

object GraftExtensions {
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("fnv_hash64"),
      new ExpressionInfo(classOf[FnvHash64].getName, "fnv_hash64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "fnv_hash64 takes exactly one argument")
        FnvHash64(children.head)
      }),
    (
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vector_dot takes exactly two arguments")
        VectorDot(children.head, children(1))
      }),
    (
      FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5_prefix60"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "md5_prefix60 takes exactly one argument")
        Md5Prefix60(children.head)
      }),
    (
      FunctionIdentifier("zorder64"),
      new ExpressionInfo(classOf[ZorderInterleave].getName, "zorder64"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "zorder64 takes exactly two arguments")
        ZorderInterleave(children.head, children(1))
      }),
  )

  /** Register the functions + optimizer rules on an already-built session
    * (the rule lands in the `User Provided Optimizers` batch via
    * `experimental.extraOptimizations` instead of the operator-optimization
    * batch — same fixed-point semantics, no session rebuild needed).
    */
  def register(spark: SparkSession): Unit = {
    val registry = org.apache.spark.sql.graft.shim.functionRegistry(spark)
    functions.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RollupRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RollupRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.JoinMvRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.JoinMvRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BucketPruneRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BucketPruneRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.PartitionPruneRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.PartitionPruneRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RowsetPruneRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RowsetPruneRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.StatsAggRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.StatsAggRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.StatsBroadcastRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.StatsBroadcastRewrite
  }
}
