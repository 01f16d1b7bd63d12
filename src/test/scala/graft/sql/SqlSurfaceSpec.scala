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

  private def usesDir(df: org.apache.spark.sql.DataFrame, frag: String): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.exists(_.toString.contains(frag))
          case _ => false
        }
    }.exists(identity)

  test("ADD ROLLUP / REFRESH ROLLUP and CREATE/REFRESH MATERIALIZED VIEW " +
    "through SQL: the transparent rewrites then serve plain spark.sql") {
    val eng = mkEngine()
    GraftSql.bind(spark, eng)
    try {
      g("CREATE DATABASE g_rup")
      g("""CREATE TABLE g_rup.fact (k BIGINT, grp VARCHAR(8), fk BIGINT, v BIGINT)
          |DUPLICATE KEY (k) DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
      g("""CREATE TABLE g_rup.dim (dk BIGINT, seg VARCHAR(8))
          |DUPLICATE KEY (dk) DISTRIBUTED BY HASH(dk) BUCKETS 1""".stripMargin)
      import spark.implicits._
      (0L until 90L).map(i => (i, s"g${i % 3}", i % 5, i))
        .toDF("k", "grp", "fk", "v").createOrReplaceTempView("rup_src")
      (0L until 5L).map(d => (d, s"s${d % 2}")).toDF("dk", "seg")
        .createOrReplaceTempView("dim_src")
      g("INSERT INTO g_rup.fact SELECT * FROM rup_src WHERE k < 60")
      g("INSERT INTO g_rup.dim SELECT * FROM dim_src")

      g("ALTER TABLE g_rup.fact ADD ROLLUP by_grp (grp) " +
        "AGG (SUM(v) AS s_v, COUNT(*) AS n_rows)")
      g("CREATE OR REPLACE TEMP VIEW rup_fact AS SCAN g_rup.fact")
      def agg() = spark.sql(
        "SELECT grp, sum(v) AS s_v, count(*) AS n_rows FROM rup_fact GROUP BY grp")
      assert(usesDir(agg(), "rollups"), "the rollup must serve the SQL aggregate")
      val got = agg().collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === (0L until 60L).groupBy(i => s"g${i % 3}")
        .map { case (grp, is) => (grp, is.sum, is.size.toLong) }.toSet)

      // a new load makes the rollup stale — the rewrite must stand down
      g("INSERT INTO g_rup.fact SELECT * FROM rup_src WHERE k >= 60")
      g("CREATE OR REPLACE TEMP VIEW rup_fact AS SCAN g_rup.fact")
      assert(!usesDir(agg(), "rollups"), "a stale rollup must not serve")
      g("REFRESH ROLLUP by_grp ON g_rup.fact")
      assert(usesDir(agg(), "rollups"), "the refreshed rollup serves again")
      assert(agg().collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
        (0L until 90L).groupBy(i => s"g${i % 3}")
          .map { case (grp, is) => (grp, is.sum) }.toSet)

      // async join MV through SQL: the join itself is eliminated
      g("CREATE MATERIALIZED VIEW mv_seg ON g_rup.fact JOIN g_rup.dim " +
        "ON fk = dk GROUP BY (seg) AGG (SUM(v) AS s_v, COUNT(*) AS n_rows)")
      g("CREATE OR REPLACE TEMP VIEW rup_dim AS SCAN g_rup.dim")
      def mvq() = spark.sql(
        """SELECT seg, sum(v) AS s_v FROM rup_fact f
          |JOIN rup_dim d ON f.fk = d.dk GROUP BY seg""".stripMargin)
      assert(usesDir(mvq(), "mvs"), "the MV must serve the SQL join-aggregate")
      assert(mvq().collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
        (0L until 90L).groupBy(i => s"s${(i % 5) % 2}")
          .map { case (seg, is) => (seg, is.sum) }.toSet)
      // refresh path exists and reports fresh
      val st = g("REFRESH MATERIALIZED VIEW mv_seg ON g_rup.fact").collect().head
      assert(st.getString(2).contains("fresh=true"))
    } finally GraftSql.unbind(spark)
  }

  test("SHOW CREATE TABLE round-trips: executing the rendered DDL on a " +
    "fresh engine recreates an equivalent TableDef") {
    val eng1 = mkEngine()
    GraftSql.bind(spark, eng1)
    val ddl =
      try {
        g("CREATE DATABASE g_sct")
        g("""CREATE TABLE g_sct.t (
            |  k BIGINT, d DATE, s VARCHAR(12), amt DECIMAL(18, 2) SUM,
            |  mx BIGINT MAX, note STRING
            |) AGGREGATE KEY (k, d)
            |PARTITION BY RANGE(d) (
            |  PARTITION p0 VALUES LESS THAN ('1996-01-01'),
            |  PARTITION p1 VALUES LESS THAN (MAXVALUE)
            |)
            |DISTRIBUTED BY HASH(k) BUCKETS 4
            |PROPERTIES ("retention" = "keep_versions:5",
            |  "varchar_mode" = "truncate")""".stripMargin)
        g("SHOW CREATE TABLE g_sct.t").collect().head.getString(0)
      } finally GraftSql.unbind(spark)
    val eng2 = mkEngine()
    GraftSql.bind(spark, eng2)
    try {
      g("CREATE DATABASE g_sct")
      g(ddl) // the rendered statement must parse and execute as-is
      assert(eng2.catalog.getTable("g_sct", "t").get ===
        eng1.catalog.getTable("g_sct", "t").get,
        s"round-trip diverged; rendered DDL was:\n$ddl")
    } finally GraftSql.unbind(spark)
    // non-engine targets delegate to Spark's own SHOW CREATE TABLE (which
    // then rejects the unknown names itself) — the ownership contract
    GraftSql.bind(spark, eng1)
    try {
      intercept[Exception] { g("SHOW CREATE TABLE g_sct.nosuch").collect() }
      intercept[Exception] { g("SHOW CREATE TABLE nosuchtbl").collect() }
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

  test("delegation: standard Spark DDL on two-part names is NOT claimed — " +
    "the injected parser must hand it to Spark untouched") {
    def delegates(sql: String): Unit =
      assert(GraftSqlParser.parse(sql).isEmpty, s"must delegate: $sql")
    // CREATE TABLE: Spark tails, Spark types, column COMMENTs
    delegates("CREATE TABLE db.t (c INT) USING parquet")
    delegates("CREATE TABLE db.t (c INT, d STRING) USING parquet " +
      "TBLPROPERTIES ('a' = 'b')")
    delegates("CREATE TABLE db.t (c INT, d DATE) USING parquet PARTITIONED BY (d)")
    delegates("CREATE TABLE db.t (c ARRAY<INT>, m MAP<STRING, INT>)")
    delegates("CREATE TABLE db.t (c INT COMMENT 'the c column')")
    delegates("CREATE TABLE db.t (c INT) COMMENT 'tbl' LOCATION '/tmp/x'")
    delegates("CREATE TABLE db.t AS SELECT 1 AS c")
    // ALTER TABLE: every standard Spark form
    delegates("ALTER TABLE db.t RENAME TO db.t2")
    delegates("ALTER TABLE db.t ADD COLUMNS (c INT, d STRING)")
    delegates("ALTER TABLE db.t ADD COLUMN c INT FIRST")
    delegates("ALTER TABLE db.t ADD COLUMN c INT COMMENT 'x' AFTER b")
    delegates("ALTER TABLE db.t ADD IF NOT EXISTS PARTITION (dt = '2021-01-01')")
    delegates("ALTER TABLE db.t ADD PARTITION (dt = '2021-01-01')")
    delegates("ALTER TABLE db.t DROP IF EXISTS PARTITION (dt = '2021-01-01')")
    delegates("ALTER TABLE db.t DROP PARTITION (dt = '2021-01-01')")
    delegates("ALTER TABLE db.t DROP COLUMNS (c, d)")
    delegates("ALTER TABLE db.t SET TBLPROPERTIES ('a' = 'b')")
    delegates("ALTER TABLE db.t ALTER COLUMN c TYPE BIGINT")
    delegates("ALTER TABLE db.t RECOVER PARTITIONS")
    // and a graft marker still claims + a malformed tail PAST it stays loud
    assert(GraftSqlParser.parse(
      "CREATE TABLE db.t (k BIGINT, v BIGINT) UNIQUE KEY (k) " +
        "DISTRIBUTED BY HASH(k) BUCKETS 2").isDefined)
    intercept[GraftParseException] {
      GraftSqlParser.parse("CREATE TABLE db.t (k BIGINT) UNIQUE KEY (k) " +
        "DISTRIBUTED BY HASH(k) BUCKET 2") // BUCKETS misspelled post-marker
    }
    intercept[GraftParseException] {
      GraftSqlParser.parse("CREATE TABLE db.t (k BIGINT SUM) USING parquet")
    } // an aggregate marker claims, so the Spark tail is now a loud error
  }

  test("delegated Spark DDL EXECUTES on an extension session (end to end, " +
    "not just parse-level): two-part CREATE TABLE ... USING parquet works " +
    "with an engine bound") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s2 = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      GraftSql.bind(s2, mkEngine())
      // `default` is a Spark-side database the engine does not know: every
      // statement below must delegate (two-part names throughout)
      s2.sql("DROP TABLE IF EXISTS default.graft_delegation_plain")
      s2.sql("CREATE TABLE default.graft_delegation_plain (c INT, d STRING) USING parquet")
      s2.sql("INSERT INTO default.graft_delegation_plain SELECT 1, 'a'")
      assert(s2.sql("SELECT c FROM default.graft_delegation_plain")
        .collect().head.getInt(0) === 1)
      s2.sql("ALTER TABLE default.graft_delegation_plain ADD COLUMNS (e INT)")
      assert(s2.table("default.graft_delegation_plain").columns.contains("e"))
      s2.sql("DROP TABLE default.graft_delegation_plain")
      GraftSql.unbind(s2)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("SHOW CREATE TABLE round-trips values containing quotes (bounds, " +
    "list values, properties)") {
    val eng1 = mkEngine()
    GraftSql.bind(spark, eng1)
    val ddl =
      try {
        g("CREATE DATABASE g_q")
        g("""CREATE TABLE g_q.t (
            |  k BIGINT, s VARCHAR(20), v BIGINT
            |) UNIQUE KEY (k)
            |PARTITION BY LIST(s) (
            |  PARTITION pa VALUES IN ('o''brien', 'plain'),
            |  PARTITION pb VALUES IN ('x')
            |)
            |DISTRIBUTED BY HASH(k) BUCKETS 2
            |PROPERTIES ("sequence_column" = "v")""".stripMargin)
        val td = eng1.catalog.getTable("g_q", "t").get
        assert(td.partitions.head.listValues === Seq("o'brien", "plain"),
          "the '' escape must decode at parse time")
        g("SHOW CREATE TABLE g_q.t").collect().head.getString(0)
      } finally GraftSql.unbind(spark)
    val eng2 = mkEngine()
    GraftSql.bind(spark, eng2)
    try {
      g("CREATE DATABASE g_q")
      g(ddl)
      assert(eng2.catalog.getTable("g_q", "t").get ===
        eng1.catalog.getTable("g_q", "t").get,
        s"quoted-value round trip diverged; rendered DDL was:\n$ddl")
    } finally GraftSql.unbind(spark)
  }

  test("engineFor never crosses sessions ambiguously: a newSession twin " +
    "resolves the unique binding; with TWO bindings it resolves neither") {
    val engA = mkEngine()
    val twin = spark.newSession()
    GraftSql.bind(spark, engA)
    try {
      assert(GraftSql.engineFor(twin).contains(engA),
        "a newSession twin of the bound session shares its engine")
      // second engine bound on another twin → ambiguity → unbound sessions
      // resolve NOTHING (no silent cross-warehouse claims)
      val other = spark.newSession()
      val engB = mkEngine()
      GraftSql.bind(other, engB)
      try {
        assert(GraftSql.engineFor(twin).isEmpty,
          "two bindings on one context must not fall back for a third session")
        assert(GraftSql.engineFor(spark).contains(engA))
        assert(GraftSql.engineFor(other).contains(engB))
        // the dispatcher on the unbound twin delegates engine DDL to Spark
        // rather than executing it against someone's warehouse
        engA.createDatabase("g_scope")
        intercept[Exception] {
          GraftSql.sql(twin, "SHOW ROWSETS IN g_scope.nosuch").collect()
        }
      } finally GraftSql.unbind(other)
    } finally GraftSql.unbind(spark)
  }

  test("SHOW ROLLUPS / SHOW MATERIALIZED VIEWS / SHOW CLONES: the lifecycle " +
    "objects a table carries are introspectable through SQL, and a RENAME " +
    "COLUMN re-materializes the rollups/MVs that reference it") {
    val eng = mkEngine()
    GraftSql.bind(spark, eng)
    try {
      g("CREATE DATABASE g_show")
      g("""CREATE TABLE g_show.fact (k BIGINT, grp VARCHAR(4), fk BIGINT,
          |  v BIGINT) DUPLICATE KEY (k)
          |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
      g("""CREATE TABLE g_show.dim (dk BIGINT, seg VARCHAR(4))
          |DUPLICATE KEY (dk) DISTRIBUTED BY HASH(dk) BUCKETS 2""".stripMargin)
      g("INSERT INTO g_show.fact SELECT id, CAST(id % 3 AS STRING), id % 5, " +
        "id * 10 FROM range(100)")
      g("INSERT INTO g_show.dim SELECT id, CAST(id % 2 AS STRING) FROM range(5)")
      g("ALTER TABLE g_show.fact ADD ROLLUP by_grp (grp) AGG (SUM(v) AS s_v, " +
        "COUNT(*) AS n)")
      g("CREATE MATERIALIZED VIEW by_seg ON g_show.fact JOIN g_show.dim " +
        "ON fk = dk GROUP BY (seg) AGG (SUM(v) AS s_v, COUNT(*) AS n)")
      g("CREATE TABLE g_show.fact_clone SHALLOW CLONE g_show.fact")

      val rollups = g("SHOW ROLLUPS IN g_show.fact").collect()
      assert(rollups.length == 1 && rollups.head.getAs[String]("name") == "by_grp")
      assert(rollups.head.getAs[Boolean]("fresh"))
      assert(rollups.head.getAs[String]("aggs").contains("SUM(v) AS s_v"))
      val mvs = g("SHOW MATERIALIZED VIEWS IN g_show.fact").collect()
      assert(mvs.length == 1 && mvs.head.getAs[String]("name") == "by_seg")
      assert(mvs.head.getAs[String]("join").contains("g_show.dim"))
      assert(mvs.head.getAs[Boolean]("fresh"))
      val clones = g("SHOW CLONES IN g_show.fact").collect()
      assert(clones.length == 1 &&
        clones.head.getAs[String]("clone_table") == "fact_clone")
      assert(clones.head.getAs[Long]("borrowed_rowsets") >= 1L)
      // a table with none of them lists empty (not an error)
      assert(g("SHOW ROLLUPS IN g_show.dim").count() === 0L)
      assert(g("SHOW CLONES IN g_show.dim").count() === 0L)

      // RENAME COLUMN v -> amount: the rollup AND the MV reference v; both
      // must follow the rename (re-materialized, still fresh, new name in
      // the listing) instead of standing down
      g("ALTER TABLE g_show.fact RENAME COLUMN v TO amount")
      val after = g("SHOW ROLLUPS IN g_show.fact").collect().head
      assert(after.getAs[Boolean]("fresh"),
        "rollup must be re-materialized, not stood down, after the rename")
      assert(after.getAs[String]("aggs").contains("SUM(amount) AS s_v"))
      val mvAfter = g("SHOW MATERIALIZED VIEWS IN g_show.fact").collect().head
      assert(mvAfter.getAs[Boolean]("fresh"))
      assert(mvAfter.getAs[String]("aggs").contains("SUM(amount) AS s_v"))
      // and the rewritten rollup genuinely serves the new-name aggregate
      graft.GraftExtensions.register(spark)
      import org.apache.spark.sql.functions.{col, sum}
      val q = eng.scan("g_show", "fact").groupBy(col("grp"))
        .agg(sum(col("amount")).as("s_v"))
      val leaves = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Seq.empty
          }
      }.flatten
      assert(leaves.exists(_.contains("rollups/by_grp/")),
        s"post-rename aggregate not rollup-served; read: ${leaves.mkString(", ")}")
    } finally GraftSql.unbind(spark)
  }

  test("MAINTAIN WAREHOUSE: one SQL verb runs the scheduled compaction " +
    "loop + group hygiene; answers are unchanged and fragments collapse") {
    val eng = mkEngine()
    GraftSql.bind(spark, eng)
    try {
      g("CREATE DATABASE g_mw")
      g("""CREATE TABLE g_mw.t (k BIGINT, v BIGINT) UNIQUE KEY (k)
          |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
      (0 until 4).foreach(i =>
        g(s"INSERT INTO g_mw.t VALUES ($i, ${i * 10}), (99, $i)"))
      // an abandoned stage from a 'crashed session' for the hygiene sweep
      val orphanGroup = eng.newLoadGroup()
      import spark.implicits._
      eng.ingest("g_mw", "t", Seq((500L, 1L)).toDF("k", "v"),
        group = Some(orphanGroup))
      assert(eng.manifest("g_mw", "t").pendingGroupIds.nonEmpty)
      val before = eng.manifest("g_mw", "t").visibleRowsets.size
      assert(before >= 4)
      val out = g("MAINTAIN WAREHOUSE").collect().head
      assert(out.getString(0) === "MAINTAIN WAREHOUSE")
      assert(out.getString(2).contains("g_mw.t"), out.getString(2))
      assert(eng.manifest("g_mw", "t").visibleRowsets.size === 1,
        "fragments must collapse to one rowset")
      // grace protects the young stage; a zero-grace sweep reaps it
      assert(eng.manifest("g_mw", "t").pendingGroupIds.nonEmpty)
      eng.sweepGroups(graceMs = 0L)
      assert(eng.manifest("g_mw", "t").pendingGroupIds.isEmpty)
      g("CREATE TEMP VIEW g_mw_t AS SCAN g_mw.t")
      assert(spark.sql("SELECT v FROM g_mw_t WHERE k = 99").collect()
        .head.getLong(0) === 3L, "latest upsert must win through compaction")
      // bare MAINTAIN without WAREHOUSE is not ours
      assert(GraftSqlParser.parse("MAINTAIN somethingelse").isEmpty)
    } finally GraftSql.unbind(spark)
  }

  test("DESCRIBE db.t: engine tables get the Doris-shaped listing (key " +
    "flag, aggregate, varchar bound); everything else delegates to Spark") {
    val eng = mkEngine()
    GraftSql.bind(spark, eng)
    try {
      g("CREATE DATABASE g_desc")
      g("""CREATE TABLE g_desc.t (
          |  k BIGINT, s VARCHAR(12), amt DECIMAL(18, 2) SUM, note STRING
          |) AGGREGATE KEY (k)
          |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
      val rows = g("DESCRIBE g_desc.t").collect()
        .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
          Option(r.getString(3)))).toList
      assert(rows === List(
        ("k", "BIGINT", true, None),
        ("s", "VARCHAR(12)", false, None),
        ("amt", "DECIMAL(18,2)", false, Some("SUM")),
        ("note", "STRING", false, None)))
      // DESC alias + optional TABLE keyword
      assert(g("DESC TABLE g_desc.t").count() === 4L)
      // one-part names, EXTENDED, and unknown tables are Spark's
      assert(GraftSqlParser.parse("DESCRIBE sometable").isEmpty)
      assert(GraftSqlParser.parse("DESCRIBE EXTENDED db.t").isEmpty)
      assert(GraftSqlParser.parse("DESCRIBE db.t PARTITION (p='x')").isEmpty)
      intercept[Exception] { g("DESCRIBE nosuchdb.nosuchtable").collect() }
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
      // and plain spark.sql SELECT resolves the engine table directly —
      // the parse-time splice, no AS SCAN view needed
      assert(s2.sql("SELECT sum(v) AS s FROM g_x.t").collect()
        .head.getLong(0) === 31L)
      GraftSql.unbind(s2)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("MAINTAIN WAREHOUSE TIERED: delta tiers cumulative-merge through SQL; " +
    "SHOW PARTITIONS reports metadata row counts") {
    val eng = mkEngine()
    GraftSql.bind(spark, eng)
    try {
      g("CREATE DATABASE g_mt")
      g("""CREATE TABLE g_mt.t (k BIGINT, v BIGINT) DUPLICATE KEY (k)
          |PARTITION BY RANGE(k) (PARTITION p0 VALUES LESS THAN ('500'),
          |  PARTITION p1 VALUES LESS THAN (MAXVALUE))
          |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
      // one big base + three small deltas (keys 100-499: range bounds
      // compare as strings, so the base band must share the bound's width)
      g("INSERT INTO g_mt.t SELECT id, id * 2 FROM range(100, 500)")
      (1 to 3).foreach(i =>
        g(s"INSERT INTO g_mt.t VALUES (${500 + i}, $i)"))
      val baseId = eng.manifest("g_mt", "t").visibleRowsets.maxBy(_.numRows).rowsetId
      val out = g("MAINTAIN WAREHOUSE TIERED").collect().head
      assert(out.getString(0) === "MAINTAIN WAREHOUSE TIERED")
      assert(out.getString(2).contains("g_mt.t=cumulative"), out.getString(2))
      val vis = eng.manifest("g_mt", "t").visibleRowsets
      assert(vis.size === 2 && vis.exists(_.rowsetId == baseId),
        "the base must survive a tiered tick untouched")
      // SHOW PARTITIONS num_rows folds from the per-partition harvest
      val parts = g("SHOW PARTITIONS IN g_mt.t").collect()
        .map(r => r.getString(0) -> r.getLong(5)).toMap
      assert(parts === Map("p0" -> 400L, "p1" -> 3L))
    } finally GraftSql.unbind(spark)
  }

  test("plain SELECT over db.t: engine tables resolve with no view ceremony") {
    val eng = mkEngine()
    GraftSql.bind(spark, eng)
    try {
      g("CREATE DATABASE g_sel")
      g("""CREATE TABLE g_sel.t (k BIGINT, v BIGINT) UNIQUE KEY (k)
          |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
      g("INSERT INTO g_sel.t SELECT id, id * 10 FROM range(100)")
      g("INSERT INTO g_sel.t VALUES (5, 999)") // upsert: merge-on-read must ride
      // dispatcher path: SELECT straight over the engine table
      val r = g("SELECT count(*) AS n, sum(v) AS s FROM g_sel.t WHERE k < 10")
        .collect().head
      assert(r.getLong(0) == 10L)
      assert(r.getLong(1) == (0 until 10).map(_ * 10L).sum - 50L + 999L)
      // joins against non-engine relations compose; engine names the
      // catalog doesn't hold stay Spark's
      spark.range(0, 5).toDF("k").createOrReplaceTempView("g_sel_ids")
      assert(g("SELECT count(*) AS n FROM g_sel.t t JOIN g_sel_ids i ON t.k = i.k")
        .collect().head.getLong(0) == 5L)
      assert(g("SELECT count(*) AS n FROM g_sel_ids").collect().head.getLong(0) == 5L)
      // subquery positions splice too
      assert(g("SELECT (SELECT max(k) FROM g_sel.t) AS m").collect()
        .head.getLong(0) == 99L)
      // freshness is per-statement: a new upsert is visible immediately
      g("INSERT INTO g_sel.t VALUES (5, 1234)")
      assert(g("SELECT v FROM g_sel.t WHERE k = 5").collect().head.getLong(0) == 1234L)
      // plan-persisting statements are NOT spliced: a Spark temp view over
      // an engine table would freeze the covering set — it must fail
      // loudly (AS SCAN views are the durable form, re-resolved per query)
      intercept[Exception] {
        g("CREATE TEMP VIEW frozen AS SELECT * FROM g_sel.t").collect()
      }
    } finally GraftSql.unbind(spark)
  }

  test("CTAS: CREATE TABLE <MODEL> KEY ... AS <query> derives the schema, " +
    "creates and loads in one statement; plain Spark CTAS delegates") {
    val eng = mkEngine()
    GraftSql.bind(spark, eng)
    try {
      g("CREATE DATABASE g_ctas")
      val out = g("""CREATE TABLE g_ctas.t UNIQUE KEY (k)
          |DISTRIBUTED BY HASH(k) BUCKETS 2
          |PROPERTIES ("retention" = "forever")
          |AS SELECT id AS k, id * 2 AS dbl, CAST(id AS DOUBLE) / 2 AS half
          |FROM range(50)""".stripMargin).collect().head
      assert(out.getAs[Long]("num_rows") == 50L)
      val td = eng.catalog.getTable("g_ctas", "t").get
      assert(td.schema.keyNames == Seq("k"))
      assert(td.schema.columns.map(_.name) == Seq("k", "dbl", "half"))
      assert(!td.schema.columns.head.nullable)
      assert(td.retention == graft.catalog.Retention.Forever)
      assert(g("SELECT count(*) AS n, sum(dbl) AS s FROM g_ctas.t")
        .collect().head.getLong(1) == (0 until 50).map(_ * 2L).sum)
      // upserts compose: the CTAS table is a full Unique-model citizen
      g("INSERT INTO g_ctas.t VALUES (7, 7777, 0.5)")
      assert(g("SELECT dbl FROM g_ctas.t WHERE k = 7")
        .collect().head.getLong(0) == 7777L)
      // KEY naming a column the query does not yield: loud
      assertThrows[IllegalArgumentException](
        g("CREATE TABLE g_ctas.bad DUPLICATE KEY (nope) AS SELECT 1 AS a"))
      // existing table: loud
      assertThrows[IllegalArgumentException](
        g("CREATE TABLE g_ctas.t DUPLICATE KEY (k) AS SELECT 1 AS k"))
      // plain Spark CTAS (no model clause) is NOT claimed — it delegates
      // and fails with SPARK's error, not a graft parse error
      val d = intercept[Exception](
        g("CREATE TABLE nodb.nope AS SELECT 1 AS a"))
      assert(!d.isInstanceOf[graft.sql.GraftParseException])
      // DISTRIBUTED omitted: one implicit bucket, no crash, loads fine
      g("CREATE TABLE g_ctas.nodist DUPLICATE KEY (k) AS " +
        "SELECT id AS k FROM range(10)")
      assert(g("SELECT count(*) AS n FROM g_ctas.nodist")
        .collect().head.getLong(0) == 10L)
      // a failed LOAD drops the created table (CTAS is atomic): HASH
      // bucketing on a column the query does not yield fails at ingest
      intercept[Exception](
        g("CREATE TABLE g_ctas.gone DUPLICATE KEY (k) " +
          "DISTRIBUTED BY HASH(missing) BUCKETS 2 AS SELECT 1 AS k"))
      assert(eng.catalog.getTable("g_ctas", "gone").isEmpty,
        "a failed CTAS must not leave a created-but-empty table behind")
    } finally GraftSql.unbind(spark)
  }

  test("SHOW STATS: the manifest zone maps are introspectable through SQL") {
    val eng = mkEngine()
    GraftSql.bind(spark, eng)
    try {
      g("CREATE DATABASE g_stats")
      g("""CREATE TABLE g_stats.t (k BIGINT, s VARCHAR(8)) DUPLICATE KEY (k)
          |DISTRIBUTED BY HASH(k) BUCKETS 2""".stripMargin)
      g("INSERT INTO g_stats.t SELECT id, CAST(id AS STRING) FROM range(100)")
      val rows = g("SHOW STATS IN g_stats.t").collect()
        .map(r => r.getString(0) -> r).toMap
      assert(rows("k").getString(1) == "0" && rows("k").getString(2) == "99")
      assert(rows("k").getLong(3) == 0L)   // no nulls
      assert(rows("k").getLong(4) == 1L && rows("k").getLong(5) == 1L)
      // string bounds are unsigned-bytewise: "99" is the lexicographic max
      assert(rows("s").getString(2) == "99")
    } finally GraftSql.unbind(spark)
  }
}
