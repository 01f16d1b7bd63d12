package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** The injected-parser half of the SQL front door (the Delta-Lake pattern:
  * a thin `ParserInterface` that recognizes the library's statements and
  * delegates every other string to Spark's own parser). Wired by
  * `GraftExtensions` via `SparkSessionExtensions.injectParser`, i.e. active
  * on any session built with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — after which
  * `spark.sql("RESTORE TABLE db.t TO VERSION 3")` just works.
  *
  * Ownership is decided per statement by [[GraftSql.claims]] against the
  * engine bound to the RUNNING session (`GraftSql.bind`), so generic verbs
  * (INSERT/DELETE/DROP/ALTER/SHOW) only leave Spark's grammar when their
  * target actually lives in the engine catalog. With no engine bound at
  * parse time, everything delegates — the extension is inert until bound.
  */
final class GraftSqlParserInterface(delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan = {
    val active = SparkSession.getActiveSession
    val claimed = for {
      stmt <- GraftSqlParser.parse(sqlText)
      spark <- active
      eng <- GraftSql.engineFor(spark)
      if GraftSql.claims(eng, stmt)
    } yield GraftSqlCommand(stmt)
    claimed.getOrElse {
      // delegated text: splice engine tables into read positions, so plain
      // SELECT over `db.t` resolves against the bound engine's snapshot
      // (GraftSql.resolveEngineRelations — a no-op with no engine bound)
      val plan = delegate.parsePlan(sqlText)
      active.map(GraftSql.resolveEngineRelations(_, plan)).getOrElse(plan)
    }
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** A parsed graft statement as an eagerly-executed Catalyst command (the
  * same `RunnableCommand` contract Spark's own DDL uses: planned by the
  * built-in strategy into `ExecutedCommandExec`, run on the driver, result
  * rows served under the statically-declared output schema).
  */
final case class GraftSqlCommand(stmt: GraftStatement) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    DataTypeUtils.toAttributes(GraftSql.outputSchema(stmt))

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val eng = GraftSql.engineFor(sparkSession).getOrElse(
      throw new IllegalStateException(
        "no OlapEngine bound to this session — call GraftSql.bind(spark, engine)"))
    GraftSql.exec(sparkSession, eng, stmt).collect().toIndexedSeq
  }
}
