package graft.sql

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{Row, SparkSession}
import graft.{GraftExtensions, SparkTestSession}
import graft.catalog.{PartitionPolicy, VarcharMode}
import graft.engine.OlapEngine
import graft.model.KeysType

/** The SQL front door ([[GraftSql]] / [[GraftSqlParser]] /
  * [[GraftSqlParserInterface]]): Doris-flavored DDL/DML/lifecycle statements
  * over the engine, on both entry paths — the `GraftSql.sql` dispatcher
  * (any session) and the injected parser (a session built with
  * `GraftExtensions`, the `spark.sql.extensions` route).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkEngine(): OlapEngine =
    new OlapEngine(spark, Files.createTempDirectory("graft-sql-wh-"))

  private def g(text: String) = GraftSql.sql(spark, text)

  test("full lifecycle through the dispatcher: create, insert, time travel, " +
    "delete, restore, clone, compact, vacuum") {
    val eng = mkEngine()
    GraftSql.bind(spark, eng)
    try {
      g("CREATE DATABASE g_sql")
      g("""CREATE TABLE g_sql.t (
          |  k BIGINT, d DATE, s VARCHAR(10), v BIGINT
          |) UNIQUE KEY (k)
          |PARTITION BY RANGE(d) (
          |  PARTITION p0 VALUES LESS THAN ('1996-01-01'),
          |  PARTITION p1 VALUES LESS THAN (MAXVALUE)
          |)
          |DISTRIBUTED BY HASH(k) BUCKETS 4
          |PROPERTIES ("retention" = "manual", "varchar_mode" = "truncate")
          |""".stripMargin)
      val td = eng.catalog.getTable("g_sql", "t").get
      assert(td.schema.keysType === KeysType.Unique)
      assert(td.schema.keyNames === Seq("k"))
      assert(!td.schema.columns.find(_.name == "k").get.nullable)
      assert(td.policy === PartitionPolicy.Range)
      assert(td.partitions.map(_.name) === Seq("p0", "p1"))
      assert(td.bucketColumn === Some("k"))
      assert(td.numBuckets === 4)
      assert(td.varcharMode === VarcharMode.Truncate)
      assert(td.schema.columns.find(_.name == "s").get.maxLength === 10)

      // INSERT (inline VALUES tail is Spark SQL; the over-length varchar
      // exercises the declared truncate mode)
      val ins1 = g("INSERT INTO g_sql.t VALUES " +
        "(1, DATE'1995-06-01', 'aaa', 10), (2, DATE'1996-06-01', 'bbbbbbbbbbbb', 20)")
        .collect().head
      assert(ins1.getAs[Long]("num_rows") === 2L)
      // auto-assigned versions start at 0 (fresh manifest head = -1)
      assert(ins1.getAs[Long]("version_start") === 0L)
      // upsert same key (Unique model: latest version wins)
      g("INSERT INTO g_sql.t VALUES (1, DATE'1995-06-01', 'aaa2', 11)")

      g("CREATE TEMP VIEW g_t AS SCAN g_sql.t")
      assert(spark.sql("SELECT k, v FROM g_t ORDER BY k").collect().toSeq ===
        Seq(Row(1L, 11L), Row(2L, 20L)))
      assert(spark.sql("SELECT s FROM g_t WHERE k = 2").collect().head.getString(0)
        === "bbbbbbbbbb") // truncated to the declared 10-char bound
      // time travel by version (v0 = the first load, before the upsert)
      g("CREATE TEMP VIEW g_t_v1 AS SCAN g_sql.t VERSION AS OF 0")
      assert(spark.sql("SELECT v FROM g_t_v1 WHERE k = 1").collect().head.getLong(0) === 10L)
      // partition-restricted scan
      g("CREATE TEMP VIEW g_t_p0 AS SCAN g_sql.t PARTITIONS (p0)")
      assert(spark.sql("SELECT k FROM g_t_p0").collect().map(_.getLong(0)).toSet === Set(1L))

      // INSERT ... SELECT (query tail through Spark SQL over the scan view)
      g("INSERT INTO g_sql.t SELECT k + 10, d, s, v + 100 FROM g_t")
      g("CREATE OR REPLACE TEMP VIEW g_t AS SCAN g_sql.t")
      assert(spark.sql("SELECT count(*) FROM g_t").collect().head.getLong(0) === 4L)

      // DELETE (metadata-only delete version)
      g("DELETE FROM g_sql.t WHERE k > 10")
      g("CREATE OR REPLACE TEMP VIEW g_t AS SCAN g_sql.t")
      assert(spark.sql("SELECT count(*) FROM g_t").collect().head.getLong(0) === 2L)

      // RESTORE: roll the delete back
      val headBefore = eng.manifest("g_sql", "t").maxVersion
      g(s"RESTORE TABLE g_sql.t TO VERSION ${headBefore - 1}")
      g("CREATE OR REPLACE TEMP VIEW g_t AS SCAN g_sql.t")
      assert(spark.sql("SELECT count(*) FROM g_t").collect().head.getLong(0) === 4L)

      // SHOW
      assert(g("SHOW ROWSETS IN g_sql.t").count() >= 4L)
      assert(g("SHOW PARTITIONS IN g_sql.t").collect().map(_.getString(0)).toSet
        === Set("p0", "p1"))
      assert(g("SHOW TABLES IN g_sql").collect().map(_.getString(0)).toSeq === Seq("t"))

      // SHALLOW CLONE, then diverge the source and check isolation
      g("CREATE TABLE g_sql.t2 SHALLOW CLONE g_sql.t")
      g("INSERT INTO g_sql.t VALUES (99, DATE'1997-01-01', 'z', 1)")
      g("CREATE TEMP VIEW g_t2 AS SCAN g_sql.t2")
      assert(spark.sql("SELECT count(*) FROM g_t2").collect().head.getLong(0) === 4L)

      // COMPACT + VACUUM (manual retention: gc deletes the retired inputs)
      val compacted = g("COMPACT TABLE g_sql.t").collect().head
      assert(compacted.getAs[Long]("num_rows") === 5L)
      val vac = g("VACUUM g_sql.t").collect().head
      assert(vac.getString(2).startsWith("deleted"))

      // schema evolution
      g("ALTER TABLE g_sql.t ADD COLUMN w BIGINT")
      assert(eng.catalog.getTable("g_sql", "t").get.schema.columns.map(_.name)
        .contains("w"))
      g("ALTER TABLE g_sql.t DROP COLUMN w")
      assert(!eng.catalog.getTable("g_sql", "t").get.schema.columns.map(_.name)
        .contains("w"))
    } finally GraftSql.unbind(spark)
  }

  test("LIST partitions and partition lifecycle through SQL") {
    val eng = mkEngine()
    GraftSql.bind(spark, eng)
    try {
      g("CREATE DATABASE g_sql2")
      g("""CREATE TABLE g_sql2.lt (k BIGINT, c VARCHAR(8), v BIGINT)
          |DUPLICATE KEY (k)
          |PARTITION BY LIST(c) (
          |  PARTITION pa VALUES IN ('a'),
          |  PARTITION pb VALUES IN ('b', 'b2')
          |)
          |DISTRIBUTED BY HASH(k) BUCKETS 2
          |""".stripMargin)
      g("ALTER TABLE g_sql2.lt ADD PARTITION pc VALUES IN ('c')")
      assert(g("SHOW PARTITIONS IN g_sql2.lt").collect().map(_.getString(0)).toSet
        === Set("pa", "pb", "pc"))
      g("INSERT INTO g_sql2.lt VALUES (1, 'a', 1), (2, 'b2', 2), (3, 'c', 3)")
      g("ALTER TABLE g_sql2.lt DROP PARTITION pb")
      g("CREATE TEMP VIEW g_lt AS SCAN g_sql2.lt")
      assert(spark.sql("SELECT k FROM g_lt ORDER BY k").collect().map(_.getLong(0)).toSeq
        === Seq(1L, 3L)) // pb's row masked by the drop
      val parts = g("SHOW PARTITIONS IN g_sql2.lt").collect()
      assert(parts.find(_.getString(0) == "pb").get.getBoolean(4) === true) // dropped
    } finally GraftSql.unbind(spark)
  }

  test("BEGIN/COMMIT/ABORT LOAD GROUP: staged INSERT and DELETE across two " +
    "tables are invisible until COMMIT, land together, and ABORT reaps") {
    val eng = mkEngine()
    GraftSql.bind(spark, eng)
    try {
      g("CREATE DATABASE g_grp")
      for (t <- Seq("x", "y"))
        g(s"""CREATE TABLE g_grp.$t (k BIGINT, v BIGINT) UNIQUE KEY (k)
             |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
      g("INSERT INTO g_grp.x VALUES (1, 10)")
      g("INSERT INTO g_grp.y VALUES (1, 100)")

      g("BEGIN LOAD GROUP")
      g("INSERT INTO g_grp.x VALUES (2, 20)")
      g("DELETE FROM g_grp.y WHERE k = 1")
      // staged: both tables still serve the pre-group state
      g("CREATE OR REPLACE TEMP VIEW grp_x AS SCAN g_grp.x")
      g("CREATE OR REPLACE TEMP VIEW grp_y AS SCAN g_grp.y")
      assert(spark.table("grp_x").count() === 1L)
      assert(spark.table("grp_y").count() === 1L)
      // a second BEGIN while one is open is refused
      intercept[IllegalArgumentException] { g("BEGIN LOAD GROUP") }
      g("COMMIT LOAD GROUP")
      g("CREATE OR REPLACE TEMP VIEW grp_x2 AS SCAN g_grp.x")
      g("CREATE OR REPLACE TEMP VIEW grp_y2 AS SCAN g_grp.y")
      assert(spark.table("grp_x2").count() === 2L)
      assert(spark.table("grp_y2").count() === 0L) // the delete landed with it

      // ABORT: the staged load vanishes without a trace
      g("BEGIN LOAD GROUP")
      g("INSERT INTO g_grp.x VALUES (3, 30)")
      g("ABORT LOAD GROUP")
      g("CREATE OR REPLACE TEMP VIEW grp_x3 AS SCAN g_grp.x")
      assert(spark.table("grp_x3").count() === 2L)
      // COMMIT with nothing open is loud
      intercept[IllegalStateException] { g("COMMIT LOAD GROUP") }
      // a bare BEGIN (no LOAD GROUP marker) is NOT ours → delegates to Spark
      intercept[Exception] { g("BEGIN TRANSACTION").collect() }
    } finally GraftSql.unbind(spark)
  }

  test("ownership: non-graft SQL delegates; graft-only verbs fail loudly on typos") {
    val eng = mkEngine()
    GraftSql.bind(spark, eng)
    try {
      // plain Spark SQL through the dispatcher
      assert(g("SELECT 1 AS one").collect().head.getInt(0) === 1)
      // generic verb on a table the engine does not know → delegates → Spark
      // rejects it as an unknown table (proves the engine did NOT claim it)
      intercept[Exception] { g("DROP TABLE nosuchdb.nosuchtable").collect() }
      // graft-only verb with a malformed tail → loud parse error, no
      // confusing fall-through to Spark
      intercept[GraftParseException] { g("RESTORE TABLE g.t TO VERSIONS 3") }
      intercept[GraftParseException] { g("COMPACT TABLE onlyonename") }
      // unknown property fails loudly at execution
      g("CREATE DATABASE g_sql3")
      intercept[GraftParseException] {
        g("""CREATE TABLE g_sql3.bad (k BIGINT) DUPLICATE KEY (k)
            |DISTRIBUTED BY HASH(k) BUCKETS 1
            |PROPERTIES ("retentoin" = "manual")""".stripMargin)
      }
    } finally GraftSql.unbind(spark)
  }

  test("injected parser: spark.sql on an extension-built session understands " +
    "engine statements and still delegates everything else") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s2 = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate() // reuses the running SparkContext, applies the extension
    try {
      val eng = new OlapEngine(s2, Files.createTempDirectory("graft-sqlx-wh-"))
      GraftSql.bind(s2, eng)
      s2.sql("CREATE DATABASE g_x")
      s2.sql("CREATE TABLE g_x.t (k BIGINT, v BIGINT) UNIQUE KEY (k) " +
        "DISTRIBUTED BY HASH(k) BUCKETS 2")
      val ins = s2.sql("INSERT INTO g_x.t VALUES (1, 10), (2, 20), (1, 11)")
      assert(ins.collect().head.getAs[Long]("num_rows") === 3L)
      s2.sql("INSERT INTO g_x.t VALUES (2, 99)")
      s2.sql("RESTORE TABLE g_x.t TO VERSION 0") // roll the second load back
      s2.sql("CREATE TEMP VIEW x_t AS SCAN g_x.t")
      assert(s2.sql("SELECT k, v FROM x_t ORDER BY k").collect().toSeq ===
        Seq(Row(1L, 11L), Row(2L, 20L)))
      // the delegate path still owns ordinary SQL on the extension session
      assert(s2.sql("SELECT 2 + 2 AS four").collect().head.getInt(0) === 4)
      assert(s2.sql("SHOW ROWSETS IN g_x.t").count() >= 2L)
      GraftSql.unbind(s2)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
