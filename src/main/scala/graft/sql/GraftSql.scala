package graft.sql

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.catalog._
import graft.engine.OlapEngine
import graft.model.{ColumnSpec, KeysType, TableSchema}

/** The engine's SQL front door: binds an [[OlapEngine]] to a session and
  * executes [[GraftStatement]]s against it.
  *
  * Two entry points share this executor:
  *  1. `GraftSql.sql(spark, text)` — a dispatcher usable on ANY session:
  *     graft statements run against the bound engine, everything else
  *     falls through to `spark.sql` (so a script can mix engine lifecycle
  *     commands with ordinary Spark SQL over the registered scan views).
  *  2. The injected parser ([[GraftSqlParserInterface]], wired by
  *     `GraftExtensions` / `--conf spark.sql.extensions=graft.GraftExtensions`)
  *     — `spark.sql("...")` itself understands the statements, the
  *     idiomatic Catalyst route for a session built with the extension.
  *
  * Ownership policy (who claims an ambiguous verb): statements with
  * graft-only markers (RESTORE...TO VERSION, COMPACT TABLE, SHALLOW CLONE,
  * AS SCAN, SHOW ROWSETS, DISTRIBUTED BY / model-KEY CREATE TABLE) are
  * always ours; generic verbs (INSERT/DELETE/DROP/ALTER/SHOW TABLES,
  * SHOW PARTITIONS) are ours iff their `db.t` target exists in the bound
  * engine's catalog — a session using the extension keeps full access to
  * Spark's own tables under names the engine doesn't claim. CREATE
  * DATABASE is engine-side whenever an engine is bound (the bound session
  * is the engine's front door; Spark-side databases remain reachable via
  * `spark_catalog.<db>` multi-part names, which this parser never claims).
  */
object GraftSql {

  // ---- binding --------------------------------------------------------------

  private val bound = TrieMap.empty[SparkSession, OlapEngine]
  // the session's OPEN load group (BEGIN LOAD GROUP ... COMMIT/ABORT):
  // INSERT/DELETE statements executed while one is open stage under it
  private val activeGroup = TrieMap.empty[SparkSession, String]

  /** Bind `engine` as the session's SQL target. Re-binding replaces. Also
    * registers the engine's Catalyst extensions (functions + the
    * rollup/MV/prune rewrites) on the session — idempotent — so SQL issued
    * through the front door gets the same transparent optimizations a
    * `spark.sql.extensions`-built session gets.
    */
  def bind(spark: SparkSession, engine: OlapEngine): Unit = {
    graft.GraftExtensions.register(spark)
    bound.put(spark, engine): Unit
  }

  def unbind(spark: SparkSession): Unit = bound.remove(spark): Unit

  /** The engine for `spark`: an exact binding, else the unique binding
    * among sessions sharing this session's SparkContext (covers
    * `newSession()`/`cloneSession()` twins of a bound session), else None.
    * The twin check is what keeps the fallback from laundering statements
    * across trust boundaries: a session on a DIFFERENT context — or a twin
    * when two engines are bound ambiguously on one context — never
    * silently claims another session's warehouse.
    */
  def engineFor(spark: SparkSession): Option[OlapEngine] =
    bound.get(spark).orElse {
      val twins = bound.collect {
        case (s, e) if s.sparkContext eq spark.sparkContext => e
      }
      if (twins.size == 1) twins.headOption else None
    }

  private def engineOrFail(spark: SparkSession): OlapEngine =
    engineFor(spark).getOrElse(throw new IllegalStateException(
      "no OlapEngine bound to this session — call GraftSql.bind(spark, engine) first"))

  // ---- claiming -------------------------------------------------------------

  import GraftStatement._

  /** Does the bound engine claim this statement? (See ownership policy.) */
  def claims(eng: OlapEngine, stmt: GraftStatement): Boolean = stmt match {
    // graft-only shapes: always ours
    case _: CreateTable | _: CreateTableAs | _: RestoreToVersion |
         _: ShallowClone | _: Compact |
         _: Vacuum | _: BackupTable | _: RestoreFromBackup | _: ShowRowsets |
         _: ScanView | _: CreateDatabase | BeginLoadGroup | CommitLoadGroup |
         AbortLoadGroup | _: AddRollup | _: RefreshRollup | _: CreateMv |
         _: RefreshMv | MaintainWarehouse | MaintainWarehouseTiered => true
    // generic verbs: ours iff the target lives in the engine catalog
    case InsertInto(db, t, _)     => eng.catalog.getTable(db, t).isDefined
    case DeleteFrom(db, t, _)     => eng.catalog.getTable(db, t).isDefined
    case UpdateTable(db, t, _)    => eng.catalog.getTable(db, t).isDefined
    case InsertOverwrite(db, t, _, _) => eng.catalog.getTable(db, t).isDefined
    case ExportTable(db, t, _, _, _) => eng.catalog.getTable(db, t).isDefined
    case DropTable(db, t)         => eng.catalog.getTable(db, t).isDefined
    case AddColumn(db, t, _, _)   => eng.catalog.getTable(db, t).isDefined
    case DropColumn(db, t, _)     => eng.catalog.getTable(db, t).isDefined
    case ModifyColumn(db, t, _, _) => eng.catalog.getTable(db, t).isDefined
    case AddPartition(db, t, _)   => eng.catalog.getTable(db, t).isDefined
    case DropPartition(db, t, _)  => eng.catalog.getTable(db, t).isDefined
    case Rebucket(db, t, _, _)    => eng.catalog.getTable(db, t).isDefined
    case RenameColumn(db, t, _, _) => eng.catalog.getTable(db, t).isDefined
    case SetTableProps(db, t, _)  => eng.catalog.getTable(db, t).isDefined
    case ExplainPrune(db, t, _)   => eng.catalog.getTable(db, t).isDefined
    case ShowCreateTable(db, t)   => eng.catalog.getTable(db, t).isDefined
    case DescribeTable(db, t)     => eng.catalog.getTable(db, t).isDefined
    case ShowPartitions(db, t)    => eng.catalog.getTable(db, t).isDefined
    case TruncateTable(db, t, _)  => eng.catalog.getTable(db, t).isDefined
    case ShowRollups(db, t)       => eng.catalog.getTable(db, t).isDefined
    case ShowMvs(db, t)           => eng.catalog.getTable(db, t).isDefined
    case ShowClones(db, t)        => eng.catalog.getTable(db, t).isDefined
    case ShowStats(db, t)         => eng.catalog.getTable(db, t).isDefined
    case ShowTablesIn(db)         => eng.catalog.databaseExists(db)
  }

  // ---- result schemas (static per statement type — the injected-parser
  //      path must declare command output before execution) ------------------

  val statusSchema: StructType = StructType(Seq(
    StructField("command", StringType, nullable = false),
    StructField("target", StringType, nullable = false),
    StructField("detail", StringType, nullable = false)))

  val rowsetSchema: StructType = StructType(Seq(
    StructField("rowset_id", LongType, nullable = false),
    StructField("version_start", LongType, nullable = false),
    StructField("version_end", LongType, nullable = false),
    StructField("num_rows", LongType, nullable = false)))

  val rowsetsSchema: StructType = StructType(Seq(
    StructField("rowset_id", LongType, nullable = false),
    StructField("version_start", LongType, nullable = false),
    StructField("version_end", LongType, nullable = false),
    StructField("num_rows", LongType, nullable = false),
    StructField("num_files", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("created", TimestampType, nullable = true),
    StructField("stats_cols", StringType, nullable = true),
    StructField("bloom_cols", StringType, nullable = true),
    StructField("ngram_cols", StringType, nullable = true),
    StructField("ndv_cols", StringType, nullable = true),
    StructField("sum_cols", StringType, nullable = true),
    StructField("dict_cols", StringType, nullable = true),
    StructField("key_unique", BooleanType, nullable = false)))

  val partitionsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("upper_exclusive", StringType, nullable = true),
    StructField("list_values", StringType, nullable = true),
    StructField("buckets", IntegerType, nullable = false),
    StructField("dropped", BooleanType, nullable = false),
    // metadata-folded row count (OlapEngine.partitionRowCounts); null when
    // the fold is not provably exact (merge models, delete markers,
    // pre-stats rowsets) — never a guess
    StructField("num_rows", LongType, nullable = true)))

  val tablesSchema: StructType = StructType(Seq(
    StructField("table", StringType, nullable = false)))

  val ddlSchema: StructType = StructType(Seq(
    StructField("ddl", StringType, nullable = false)))

  val rollupsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("group_by", StringType, nullable = false),
    StructField("aggs", StringType, nullable = false),
    StructField("filter", StringType, nullable = true),
    StructField("stored_version", LongType, nullable = false),
    StructField("fresh", BooleanType, nullable = false)))

  val mvsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("join", StringType, nullable = false),
    StructField("group_by", StringType, nullable = false),
    StructField("aggs", StringType, nullable = false),
    StructField("stored_fact_version", LongType, nullable = false),
    StructField("stored_dim_version", LongType, nullable = false),
    StructField("fresh", BooleanType, nullable = false)))

  val describeSchema: StructType = StructType(Seq(
    StructField("col_name", StringType, nullable = false),
    StructField("data_type", StringType, nullable = false),
    StructField("is_key", BooleanType, nullable = false),
    StructField("agg", StringType, nullable = true),
    StructField("nullable", BooleanType, nullable = false),
    StructField("max_length", IntegerType, nullable = true)))

  val clonesSchema: StructType = StructType(Seq(
    StructField("clone_db", StringType, nullable = false),
    StructField("clone_table", StringType, nullable = false),
    StructField("borrowed_rowsets", LongType, nullable = false)))

  val explainPruneSchema: StructType = StructType(Seq(
    StructField("rowset_id", LongType, nullable = false),
    StructField("version_start", LongType, nullable = false),
    StructField("version_end", LongType, nullable = false),
    StructField("num_rows", LongType, nullable = false),
    StructField("decision", StringType, nullable = true)))

  val statsSchema: StructType = StructType(Seq(
    StructField("column", StringType, nullable = true),
    StructField("min", StringType, nullable = true),
    StructField("max", StringType, nullable = true),
    StructField("null_count", LongType, nullable = false),
    StructField("rowsets_with_stats", LongType, nullable = false),
    StructField("data_rowsets", LongType, nullable = false),
    StructField("bloom_rowsets", LongType, nullable = false),
    StructField("sum", StringType, nullable = true),
    StructField("sum_rowsets", LongType, nullable = false),
    StructField("ndv", DoubleType, nullable = true),
    StructField("ndv_rowsets", LongType, nullable = false)))

  def outputSchema(stmt: GraftStatement): StructType = stmt match {
    case _: InsertInto | _: InsertOverwrite | _: DeleteFrom | _: UpdateTable |
         _: CreateTableAs | _: Compact | _: Rebucket => rowsetSchema
    case _: ShowRowsets => rowsetsSchema
    case _: ShowPartitions => partitionsSchema
    case _: ShowTablesIn => tablesSchema
    case _: ShowCreateTable => ddlSchema
    case _: ShowRollups => rollupsSchema
    case _: ShowMvs => mvsSchema
    case _: ShowClones => clonesSchema
    case _: ShowStats => statsSchema
    case _: ExplainPrune => explainPruneSchema
    case _: DescribeTable => describeSchema
    case _ => statusSchema
  }

  // ---- dispatcher -----------------------------------------------------------

  /** Run `text`: a graft statement executes against the bound engine, any
    * other SQL delegates to `spark.sql`.
    */
  def sql(spark: SparkSession, text: String): DataFrame =
    GraftSqlParser.parse(text) match {
      case Some(stmt) if engineFor(spark).exists(claims(_, stmt)) =>
        exec(spark, engineOrFail(spark), stmt)
      case _ if engineFor(spark).isDefined =>
        // delegated text on a bound session: parse with Spark's grammar,
        // then splice engine tables into read positions so plain
        // `SELECT ... FROM db.t` works with no AS SCAN view ceremony
        graft.sql.GraftSql.runResolved(spark, text)
      case _ => spark.sql(text)
    }

  private def runResolved(spark: SparkSession, text: String): DataFrame = {
    val plan = spark.sessionState.sqlParser.parsePlan(text)
    val spliced = resolveEngineRelations(spark, plan)
    if (spliced eq plan) spark.sql(text)
    else org.apache.spark.sql.graft.shim.ofRows(spark, spliced)
  }

  /** Splice engine tables into a DELEGATED Spark plan: every two-part
    * `UnresolvedRelation` whose `db.t` lives in the bound engine's catalog
    * is replaced by the engine's merged scan plan (already analyzed — no
    * unresolved leaves, per-query freshness since resolution happens at
    * parse time). This is what lets `spark.sql("SELECT ... FROM db.t")`
    * work directly on an extension-built session, and `GraftSql.sql` on
    * any bound session. Ownership mirrors [[claims]]: names the engine
    * doesn't hold are untouched, so Spark's own tables stay reachable.
    * Write safety: engine DML is claimed by OUR parser before delegation,
    * so the only delegated plan that can aim a WRITE at an engine table is
    * one our grammar doesn't own (e.g. INSERT OVERWRITE) — the splice
    * turns its target into a plain query plan and analysis fails LOUDLY,
    * never silently writing files behind the manifest's back.
    */
  def resolveEngineRelations(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    engineFor(spark) match {
      case None => plan
      // statements that PERSIST their child plan (CREATE/ALTER VIEW, CACHE
      // TABLE ... AS) must not be spliced: the stored plan would freeze the
      // rowset covering set at creation — silently stale after the next
      // load, FileNotFound after GC. Left unspliced they fail resolution
      // LOUDLY for engine names; durable views over engine tables are the
      // AS SCAN views, which re-resolve the snapshot per query.
      case Some(_) if {
        val n = plan.getClass.getSimpleName
        n.contains("View") || n.contains("Cache")
      } => plan
      case Some(eng) => plan.transformUpWithSubqueries {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
            if u.multipartIdentifier.size == 2 &&
              eng.catalog.getTable(u.multipartIdentifier.head,
                u.multipartIdentifier(1)).isDefined =>
          eng.scan(u.multipartIdentifier.head, u.multipartIdentifier(1))
            .queryExecution.analyzed
      }
    }

  // ---- executor -------------------------------------------------------------

  private def status(spark: SparkSession, command: String, target: String,
                     detail: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(Seq(Row(command, target, detail)).asJava, statusSchema)
  }

  private def rowsetDf(spark: SparkSession, m: graft.manifest.RowsetMeta): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      Seq(Row(m.rowsetId, m.version.start, m.version.end, m.numRows)).asJava,
      rowsetSchema)
  }

  def exec(spark: SparkSession, eng: OlapEngine, stmt: GraftStatement): DataFrame =
    stmt match {
      case CreateDatabase(db, ifNot) =>
        if (!ifNot) require(!eng.catalog.databaseExists(db), s"database $db exists")
        eng.createDatabase(db)
        status(spark, "CREATE DATABASE", db, "ok")

      case ct: CreateTable =>
        val td = toTableDef(ct)
        eng.createTable(td)
        status(spark, "CREATE TABLE", td.qualified,
          s"${td.schema.keysType.name} keys=${td.schema.keyNames.mkString(",")}")

      case InsertInto(db, t, query) =>
        val td = eng.catalog.getTable(db, t).getOrElse(
          throw new NoSuchElementException(s"no table $db.$t"))
        // positional alignment, the classic INSERT contract; engine-side
        // conform() owns type validation/casts. An open BEGIN LOAD GROUP
        // stages the load (invisible until COMMIT LOAD GROUP).
        rowsetDf(spark, eng.ingest(db, t,
          alignInsert(spark, td, query, s"INSERT INTO $db.$t"),
          group = activeGroup.get(spark)))

      case cta: CreateTableAs =>
        require(eng.catalog.getTable(cta.db, cta.table).isEmpty,
          s"table ${cta.db}.${cta.table} already exists")
        val df = spark.sql(cta.query)
        val keySet = cta.keyColumns.toSet
        val unknown = keySet -- df.columns.toSet
        require(unknown.isEmpty,
          s"CTAS ${cta.db}.${cta.table}: KEY clause names columns the query " +
            s"does not yield: ${unknown.mkString(", ")}")
        // schema derives from the query's output, in query order; keys
        // flagged non-null from the KEY clause (Doris CTAS semantics).
        // Value aggregate markers are not expressible in CTAS — Aggregate
        // models get Replace-equivalent None, as in Doris.
        val cols = df.schema.fields.toSeq.map { f =>
          val isKey = keySet.contains(f.name)
          ColumnSpec(f.name, f.dataType, isKey = isKey, nullable = !isKey)
        }
        var td = TableDef(
          db = cta.db, name = cta.table,
          schema = TableSchema(KeysType.fromName(cta.keysType), cols),
          bucketType = if (cta.bucketType == "RANDOM") BucketType.Random
            else BucketType.Hash,
          bucketColumn = cta.bucketColumn,
          numBuckets = cta.numBuckets)
        cta.properties.foreach { case (k, v) => td = applyProperty(td, k, v) }
        eng.createTable(td)
        // create + load as one statement, ATOMICALLY: a failed load drops
        // the table we just created (Doris CTAS semantics) — the user must
        // never have to DROP a table they never successfully created
        // rollback is PHYSICAL, not metadata-only: eraseTable also deletes
        // the table dir (a half-written r<N> would fail a retried CTAS on
        // errorifexists) and evicts the cached manifest (a stale
        // _manifest.json must not resurrect into a re-created table)
        try rowsetDf(spark, eng.ingest(cta.db, cta.table, df,
          group = activeGroup.get(spark)))
        catch {
          case e: Throwable =>
            try eng.eraseTable(cta.db, cta.table)
            catch { case scala.util.control.NonFatal(_) => () }
            throw e
        }

      case InsertOverwrite(db, t, parts, query) =>
        val td = eng.catalog.getTable(db, t).getOrElse(
          throw new NoSuchElementException(s"no table $db.$t"))
        // the overwrite runs its OWN atomic group (mask + load commit
        // together); an open user group cannot also own it
        require(!activeGroup.contains(spark),
          s"INSERT OVERWRITE $db.$t inside an open load group is not " +
            "defined: the overwrite commits its own atomic mask+load " +
            "group — commit or abort the open group first")
        rowsetDf(spark, eng.overwrite(db, t,
          alignInsert(spark, td, query, s"INSERT OVERWRITE $db.$t"), parts))

      case DeleteFrom(db, t, predicate) =>
        rowsetDf(spark,
          eng.deleteWhere(db, t, predicate, group = activeGroup.get(spark)))

      case UpdateTable(db, t, setTail) =>
        // the raw tail splits HERE, after the claim, so a malformed UPDATE
        // fails loudly only on engine tables (unclaimed text delegates)
        val (sets, predicate) = GraftSqlParser.splitUpdateTail(setTail)
        // an UPDATE cannot stage: its read-modify-write reads the CURRENT
        // snapshot, which by design excludes the group's own staged loads —
        // committing it inside a group would silently order it BEFORE
        // stages the user wrote earlier in the same group
        require(!activeGroup.contains(spark),
          s"UPDATE $db.$t inside an open load group is not defined: the " +
            "update reads the current snapshot, not the group's staged " +
            "loads — commit or abort the group first")
        rowsetDf(spark, eng.updateWhere(db, t, sets, predicate))

      case TruncateTable(db, t, part) =>
        part match {
          case Some(p) =>
            eng.truncatePartition(db, t, p)
            status(spark, "TRUNCATE PARTITION", s"$db.$t", p)
          case None =>
            eng.truncateTable(db, t)
            status(spark, "TRUNCATE TABLE", s"$db.$t", "ok")
        }

      case MaintainWarehouse =>
        // one tick of the scheduled-maintenance loop: C1-C3 compaction over
        // every registered table (group-hygiene sweep rides inside), plus
        // the result-cache sweep (entries orphaned by version/schema moves)
        val compacted = eng.runScheduledCompaction()
        val sweptResults = eng.results.sweep()
        status(spark, "MAINTAIN WAREHOUSE", "*",
          s"compacted ${compacted.size} table(s)" +
            (if (compacted.isEmpty) "" else s": ${compacted.mkString(", ")}") +
            s"; group hygiene swept; $sweptResults stale cached result(s) reclaimed")

      case MaintainWarehouseTiered =>
        // the 100 TB-shaped tick: delta tiers cumulative-merge, the base
        // rewrites only under delete debt or early-life fragmentation
        val done = eng.runTieredCompaction()
        val sweptResults = eng.results.sweep()
        status(spark, "MAINTAIN WAREHOUSE TIERED", "*",
          s"${done.size} action(s)" +
            (if (done.isEmpty) ""
             else s": ${done.map { case (t, tier) => s"$t=$tier" }.mkString(", ")}") +
            s"; group hygiene swept; $sweptResults stale cached result(s) reclaimed")

      case BeginLoadGroup =>
        require(!activeGroup.contains(spark),
          s"a load group is already open (${activeGroup(spark)}) — " +
            "COMMIT LOAD GROUP or ABORT LOAD GROUP first")
        val g = eng.newLoadGroup()
        activeGroup.put(spark, g)
        status(spark, "BEGIN LOAD GROUP", g, "staged loads are invisible " +
          "until COMMIT LOAD GROUP")

      case CommitLoadGroup =>
        val g = activeGroup.remove(spark).getOrElse(
          throw new IllegalStateException("no open load group — BEGIN LOAD GROUP first"))
        eng.commitGroup(g)
        status(spark, "COMMIT LOAD GROUP", g, "ok")

      case AbortLoadGroup =>
        val g = activeGroup.remove(spark).getOrElse(
          throw new IllegalStateException("no open load group — BEGIN LOAD GROUP first"))
        eng.abortGroup(g)
        status(spark, "ABORT LOAD GROUP", g, "staged loads reaped")

      case RestoreToVersion(db, t, v) =>
        eng.restoreToVersion(db, t, v)
        status(spark, "RESTORE", s"$db.$t",
          s"restored to version $v; head=${eng.manifest(db, t).maxVersion}")

      case ShallowClone(sdb, st, ddb, dt, asOf) =>
        eng.cloneTable(sdb, st, ddb, dt, asOf)
        status(spark, "SHALLOW CLONE", s"$ddb.$dt",
          s"from $sdb.$st${asOf.fold("")(v => s" version as of $v")}")

      case Compact(db, t, cumulativeAt) =>
        val meta = cumulativeAt match {
          case Some(layer) => eng.compactCumulative(db, t, layer)
          case None => eng.compact(db, t)
        }
        rowsetDf(spark, meta)

      case Vacuum(db, t) =>
        val deleted = eng.gc(db, t)
        status(spark, "VACUUM", s"$db.$t", s"deleted ${deleted.size} rowsets")

      case ExportTable(db, t, parts, dest, fmt) =>
        val n = eng.exportTable(db, t, java.nio.file.Paths.get(dest), fmt, parts)
        status(spark, "EXPORT", s"$db.$t",
          s"wrote $n $fmt file(s) to $dest" +
            (if (parts.nonEmpty) s" (partitions ${parts.mkString(", ")})" else ""))

      case BackupTable(db, t, dest) =>
        val ids = eng.backup(db, t, java.nio.file.Paths.get(dest))
        status(spark, "BACKUP", s"$db.$t", s"backed up ${ids.size} rowsets to $dest")

      case RestoreFromBackup(db, t, src) =>
        val ids = eng.restore(db, t, java.nio.file.Paths.get(src))
        status(spark, "RESTORE FROM", s"$db.$t", s"restored ${ids.size} rowsets from $src")

      case ShowRowsets(db, t) =>
        eng.describeRowsets(db, t)

      case ShowPartitions(db, t) =>
        import scala.jdk.CollectionConverters._
        val td = eng.catalog.getTable(db, t).getOrElse(
          throw new NoSuchElementException(s"no table $db.$t"))
        val counts = eng.partitionRowCounts(db, t)
        val rows = (td.partitions.map((_, false)) ++ td.droppedPartitions.map((_, true)))
          .map { case (p, dropped) =>
            Row(p.name, p.upperExclusive.orNull,
              if (p.listValues.isEmpty) null else p.listValues.mkString(","),
              p.numBuckets.max(td.numBuckets), dropped,
              counts.map(c => java.lang.Long.valueOf(c.getOrElse(p.name, 0L))).orNull)
          }
        spark.createDataFrame(rows.asJava, partitionsSchema)

      case DescribeTable(db, t) =>
        import scala.jdk.CollectionConverters._
        import graft.model.AggType
        val td = eng.catalog.getTable(db, t).getOrElse(
          throw new NoSuchElementException(s"no table $db.$t"))
        val rows = td.schema.columns.map { c =>
          Row(c.name,
            if (c.maxLength > 0) s"VARCHAR(${c.maxLength})" else c.dataType.sql,
            c.isKey,
            if (c.agg == AggType.None) null else c.agg.name,
            c.nullable,
            if (c.maxLength > 0) Int.box(c.maxLength) else null)
        }
        spark.createDataFrame(rows.asJava, describeSchema)

      case ShowCreateTable(db, t) =>
        import scala.jdk.CollectionConverters._
        val td = eng.catalog.getTable(db, t).getOrElse(
          throw new NoSuchElementException(s"no table $db.$t"))
        spark.createDataFrame(Seq(Row(createTableSql(td))).asJava, ddlSchema)

      case ShowTablesIn(db) =>
        import scala.jdk.CollectionConverters._
        spark.createDataFrame(
          eng.catalog.listTables(db).map(Row(_)).asJava, tablesSchema)

      case ShowRollups(db, t) =>
        import scala.jdk.CollectionConverters._
        val rows = eng.rollups.list(db, t).map { case (rd, v) =>
          val aggs = (rd.aggs.map { case (o, s, a) => s"${a.name}($s) AS $o" } ++
            rd.countCol.map(c => s"COUNT(*) AS $c") ++
            rd.bitmapCol.map { case (o, s) => s"BITMAP($s) AS $o" } ++
            rd.hllCol.map { case (o, s) => s"HLL($s) AS $o" }).mkString(", ")
          Row(rd.name, rd.groupCols.mkString(", "), aggs, rd.filter.orNull,
            v, eng.rollups.isFresh(db, t, rd.name))
        }
        spark.createDataFrame(rows.asJava, rollupsSchema)

      case ShowMvs(db, t) =>
        import scala.jdk.CollectionConverters._
        val rows = eng.mvs.list(db, t).map { case (d, fv, dv) =>
          val aggs = (d.aggs.map { case (o, s, a) => s"${a.name}($s) AS $o" } ++
            d.countCol.map(c => s"COUNT(*) AS $c")).mkString(", ")
          Row(d.name,
            s"${d.factDb}.${d.factTable} JOIN ${d.dimDb}.${d.dimTable} " +
              s"ON ${d.factKey} = ${d.dimKey}",
            d.groupCols.mkString(", "), aggs, fv, dv,
            eng.mvs.isFresh(db, t, d.name))
        }
        spark.createDataFrame(rows.asJava, mvsSchema)

      case ShowClones(db, t) =>
        import scala.jdk.CollectionConverters._
        val rows = eng.clonesOf(db, t).map { case (cdb, ctbl, ids) =>
          Row(cdb, ctbl, ids.size.toLong)
        }
        spark.createDataFrame(rows.asJava, clonesSchema)

      case ShowStats(db, t) =>
        import scala.jdk.CollectionConverters._
        val rows = eng.describeStats(db, t).collect().toSeq
        spark.createDataFrame(rows.asJava, statsSchema)

      case ExplainPrune(db, t, pred) =>
        import scala.jdk.CollectionConverters._
        val rows = eng.explainPrune(db, t,
          org.apache.spark.sql.functions.expr(pred)).collect().toSeq
        spark.createDataFrame(rows.asJava, explainPruneSchema)

      case DropTable(db, t) =>
        require(eng.catalog.dropTable(db, t), s"no table $db.$t")
        status(spark, "DROP TABLE", s"$db.$t", "ok")

      case AddColumn(db, t, spec, default) =>
        eng.addColumn(db, t, spec, default)
        status(spark, "ALTER TABLE ADD COLUMN", s"$db.$t",
          spec.name + default.fold("")(v => s" DEFAULT '$v'"))

      case DropColumn(db, t, name) =>
        eng.dropColumn(db, t, name)
        status(spark, "ALTER TABLE DROP COLUMN", s"$db.$t", name)

      case ModifyColumn(db, t, name, to) =>
        eng.modifyColumnType(db, t, name, to)
        status(spark, "ALTER TABLE MODIFY COLUMN", s"$db.$t", s"$name -> ${to.sql}")

      case AddPartition(db, t, spec) =>
        eng.addPartition(db, t, spec)
        status(spark, "ALTER TABLE ADD PARTITION", s"$db.$t", spec.name)

      case DropPartition(db, t, name) =>
        eng.dropPartition(db, t, name)
        status(spark, "ALTER TABLE DROP PARTITION", s"$db.$t", name)

      case Rebucket(db, t, colOpt, n) =>
        rowsetDf(spark, eng.rebucket(db, t, n, colOpt))

      case RenameColumn(db, t, o, n) =>
        eng.renameColumn(db, t, o, n)
        status(spark, "ALTER TABLE RENAME COLUMN", s"$db.$t", s"$o -> $n")

      case SetTableProps(db, t, props) =>
        eng.alterProperties(db, t, props)
        status(spark, "ALTER TABLE SET", s"$db.$t",
          props.map { case (k, v) => s"$k=$v" }.mkString(", "))

      case AddRollup(db, t, rd) =>
        val src = eng.rollups.materialize(db, t, rd)
        status(spark, "ADD ROLLUP", s"$db.$t", s"${rd.name} built from $src")

      case RefreshRollup(db, t, name) =>
        eng.rollups.refreshIncremental(db, t, name)
        status(spark, "REFRESH ROLLUP", s"$db.$t",
          s"$name fresh=${eng.rollups.isFresh(db, t, name)}")

      case CreateMv(d) =>
        eng.mvs.materialize(d)
        status(spark, "CREATE MATERIALIZED VIEW",
          s"${d.factDb}.${d.factTable} ⋈ ${d.dimDb}.${d.dimTable}", d.name)

      case RefreshMv(db, t, name) =>
        eng.mvs.refreshIncremental(db, t, name)
        status(spark, "REFRESH MATERIALIZED VIEW", s"$db.$t",
          s"$name fresh=${eng.mvs.isFresh(db, t, name)}")

      case ScanView(view, replace, db, t, asOfV, asOfTs, parts) =>
        require(asOfV.isEmpty || asOfTs.isEmpty,
          "VERSION AS OF and TIMESTAMP AS OF cannot combine")
        require(parts.isEmpty || (asOfV.isEmpty && asOfTs.isEmpty),
          "PARTITIONS (...) applies to head scans only")
        val df = (asOfV, asOfTs) match {
          case (Some(v), _) =>
            val m = eng.manifest(db, t)
            val lo = m.visibleRowsets.map(_.version.start).minOption.getOrElse(0L)
            eng.snapshot(db, t, lo, v)
          case (_, Some(ts)) =>
            eng.snapshotAsOf(db, t, java.sql.Timestamp.valueOf(ts).getTime)
          case _ if parts.nonEmpty => eng.scanPartitions(db, t, parts)
          case _ => eng.scan(db, t)
        }
        if (replace) df.createOrReplaceTempView(view) else df.createTempView(view)
        status(spark, "CREATE TEMP VIEW", view,
          s"scan of $db.$t" + asOfV.fold("")(v => s" version as of $v") +
            asOfTs.fold("")(ts => s" timestamp as of $ts") +
            (if (parts.nonEmpty) s" partitions ${parts.mkString(",")}" else ""))
    }

  // ---- TableDef → DDL (SHOW CREATE TABLE) -----------------------------------

  /** Render a TableDef as CREATE TABLE DDL in EXACTLY the grammar
    * [[GraftSqlParser]] accepts — executing the output on a fresh engine
    * recreates an equivalent table (spec-pinned round trip). Lifecycle
    * state that is not declaration (dropped columns/partitions, rename
    * history, data) is deliberately absent: this is the CREATE statement,
    * not a backup.
    */
  def createTableSql(td: TableDef): String = {
    import graft.model.AggType
    // string literals render with the '' / "" escape the tokenizer already
    // understands — a partition bound or property value containing a quote
    // must survive the parse round trip, not break it
    def sq(v: String): String = "'" + v.replace("'", "''") + "'"
    def dq(v: String): String = "\"" + v.replace("\"", "\"\"") + "\""
    def typeSql(c: ColumnSpec): String =
      if (c.maxLength > 0) s"VARCHAR(${c.maxLength})" else c.dataType.sql
    val cols = td.schema.columns.map { c =>
      val agg = if (!c.isKey && c.agg != AggType.None) " " + c.agg.name else ""
      val nn = if (!c.isKey && !c.nullable) " NOT NULL" else ""
      val gen = td.generatedColumns.get(c.name).fold("")(e => s" AS ($e)")
      val ai = if (td.autoIncrementColumn.contains(c.name)) " AUTO_INCREMENT" else ""
      val dflt = td.columnDefaults.get(c.name).fold("")(v => s" DEFAULT ${sq(v)}")
      s"  ${c.name} ${typeSql(c)}$gen$agg$nn$ai$dflt"
    }.mkString(",\n")
    val model = s"${td.schema.keysType.name} KEY (${td.schema.keyNames.mkString(", ")})"
    val partClause = td.policy match {
      case PartitionPolicy.Unpartitioned => ""
      case p =>
        val kind = if (p == PartitionPolicy.Range) "RANGE" else "LIST"
        val specs = td.partitions.map { ps =>
          if (kind == "RANGE") {
            val b = ps.upperExclusive.get
            val bs = if (b == RangeBound.MaxValue) "MAXVALUE" else sq(b)
            s"  PARTITION ${ps.name} VALUES LESS THAN ($bs)"
          } else
            s"  PARTITION ${ps.name} VALUES IN (${ps.listValues.map(sq).mkString(", ")})"
        }.mkString(",\n")
        s"\nPARTITION BY $kind(${td.partitionColumn.get}) (\n$specs\n)"
    }
    val dist =
      if (td.bucketType == BucketType.Random) s"DISTRIBUTED BY RANDOM BUCKETS ${td.numBuckets}"
      else s"DISTRIBUTED BY HASH(${td.bucketColumn.get}) BUCKETS ${td.numBuckets}"
    val props = Seq.newBuilder[(String, String)]
    if (td.replication != 1) props += ("replication_num" -> td.replication.toString)
    td.retention match {
      case Retention.Manual => ()
      case Retention.Forever => props += ("retention" -> "forever")
      case Retention.KeepVersions(n) => props += ("retention" -> s"keep_versions:$n")
      case Retention.KeepMs(ms) => props += ("retention" -> s"keep_ms:$ms")
    }
    td.autoPartition.foreach(u => props +=
      ("dynamic_partition.unit" -> u.toString.toLowerCase))
    td.autoExpireKeep.foreach(k => props += ("dynamic_partition.keep" -> k.toString))
    td.varcharMode match {
      case VarcharMode.Ignore => ()
      case VarcharMode.Truncate => props += ("varchar_mode" -> "truncate")
      case VarcharMode.Strict => props += ("varchar_mode" -> "strict")
    }
    td.sequenceColumn.foreach(sc => props += ("sequence_column" -> sc))
    if (td.partialUpdate) props += ("partial_update" -> "true")
    if (td.expiredToDeadLetter) props += ("expired_to_dead_letter" -> "true")
    td.zorderColumns.foreach { case (x, y) => props += ("zorder" -> s"$x,$y") }
    if (td.bloomColumns.nonEmpty)
      props += ("bloom_filter_columns" -> td.bloomColumns.mkString(","))
    if (td.sumStatsColumns.nonEmpty)
      props += ("sum_stats_columns" -> td.sumStatsColumns.mkString(","))
    if (td.ngramBloomColumns.nonEmpty)
      props += ("ngram_bf_columns" -> td.ngramBloomColumns.mkString(","))
    if (td.ndvStatsColumns.nonEmpty)
      props += ("ndv_stats_columns" -> td.ndvStatsColumns.mkString(","))
    if (td.dictStatsColumns.nonEmpty)
      props += ("dict_stats_columns" -> td.dictStatsColumns.mkString(","))
    if (td.mergeOnWrite)
      props += ("enable_unique_key_merge_on_write" -> "true")
    val propClause = {
      val ps = props.result()
      if (ps.isEmpty) ""
      else "\nPROPERTIES (" +
        ps.map { case (k, v) => dq(k) + " = " + dq(v) }.mkString(", ") + ")"
    }
    s"CREATE TABLE ${td.db}.${td.name} (\n$cols\n) $model$partClause\n$dist$propClause"
  }

  // ---- CreateTable → TableDef ----------------------------------------------

  /** Positionally align an INSERT query's output to the declared columns.
    * Tables with GENERATED columns accept the non-generated width (the
    * engine computes the rest); full width is also accepted, but the
    * engine recomputes generated values regardless — a supplied value can
    * never be loaded.
    */
  private def alignInsert(spark: SparkSession, td: TableDef, query: String,
                          what: String): DataFrame = {
    val df = spark.sql(query)
    val want = td.schema.columns.map(_.name)
    val nonGen = want.filterNot(td.generatedColumns.contains)
    if (nonGen.length != want.length && df.columns.length == nonGen.length)
      df.toDF(nonGen: _*)
    else {
      require(df.columns.length == want.length,
        s"$what: query yields ${df.columns.length} columns, table declares " +
          s"${want.length} (${want.mkString(", ")})" +
          (if (nonGen.length != want.length)
            s" — or ${nonGen.length} omitting the generated columns"
          else ""))
      df.toDF(want: _*)
    }
  }

  private def toTableDef(ct: CreateTable): TableDef = {
    val keySet = ct.keyColumns.toSet
    val unknownKeys = keySet -- ct.columns.map(_.name).toSet
    require(unknownKeys.isEmpty,
      s"KEY clause names unknown columns: ${unknownKeys.mkString(", ")}")
    val cols = ct.columns.map { c =>
      if (keySet.contains(c.name)) c.copy(isKey = true, nullable = false)
      else c
    }
    val schema = TableSchema(KeysType.fromName(ct.keysType), cols)
    val (policy, parts) = ct.partitionBy match {
      case Some(("RANGE", _)) => (PartitionPolicy.Range, ct.partitions)
      case Some(("LIST", _))  => (PartitionPolicy.List, ct.partitions)
      case Some((other, _))   =>
        throw new GraftParseException(s"unknown partition policy $other")
      case None => (PartitionPolicy.Unpartitioned, Seq(PartitionSpec("p0")))
    }
    var td = TableDef(
      db = ct.db, name = ct.table, schema = schema,
      policy = policy,
      partitionColumn = ct.partitionBy.map(_._2),
      partitions = parts,
      bucketType =
        if (ct.bucketType == "RANDOM") BucketType.Random else BucketType.Hash,
      bucketColumn = ct.bucketColumn,
      numBuckets = ct.numBuckets)
    // PROPERTIES: the lifecycle dials. Unknown keys fail loudly — a typo'd
    // property silently defaulting is exactly the config rot Doris's loose
    // property bag suffers from.
    ct.properties.foreach { case (k, v) => td = applyProperty(td, k, v) }
    if (ct.defaults.nonEmpty) td = td.copy(columnDefaults = ct.defaults)
    ct.autoIncrement.foreach(c => td = td.copy(autoIncrementColumn = Some(c)))
    if (ct.generated.nonEmpty) td = td.copy(generatedColumns = ct.generated)
    td
  }

  private def applyProperty(td: TableDef, k: String, v: String): TableDef =
    k.toLowerCase match {
      case "replication_num" => td.copy(replication = v.toInt)
      case "retention" =>
        try td.copy(retention = Retention.fromString(v))
        catch { case e: IllegalArgumentException =>
          throw new GraftParseException(e.getMessage) }
      case "dynamic_partition.unit" => v.toLowerCase match {
        case "day"   => td.copy(autoPartition = Some(AutoPartitionUnit.Day))
        case "month" => td.copy(autoPartition = Some(AutoPartitionUnit.Month))
        case other => throw new GraftParseException(
          s"unknown dynamic_partition.unit '$other' (day|month)")
      }
      case "dynamic_partition.keep" => td.copy(autoExpireKeep = Some(v.toInt))
      case "varchar_mode" => v.toLowerCase match {
        case "ignore"   => td.copy(varcharMode = VarcharMode.Ignore)
        case "truncate" => td.copy(varcharMode = VarcharMode.Truncate)
        case "strict"   => td.copy(varcharMode = VarcharMode.Strict)
        case other => throw new GraftParseException(
          s"unknown varchar_mode '$other' (ignore|truncate|strict)")
      }
      case "sequence_column" => td.copy(sequenceColumn = Some(v))
      case "partial_update" => td.copy(partialUpdate = v.toBoolean)
      case "expired_to_dead_letter" => td.copy(expiredToDeadLetter = v.toBoolean)
      case "zorder" => v.split(",").map(_.trim).toSeq match {
        case Seq(x, y) => td.copy(zorderColumns = Some((x, y)))
        case _ => throw new GraftParseException(s"zorder needs exactly two columns, got '$v'")
      }
      // Doris's own property name for the per-rowset bloom skipping index
      case "bloom_filter_columns" =>
        td.copy(bloomColumns = v.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      // exact per-rowset SUM stats for metadata-served SUM/AVG (integral
      // columns; OlapEngine.sumFold / plans.StatsAggRewrite)
      case "sum_stats_columns" =>
        td.copy(sumStatsColumns = v.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      // character-trigram substring index (Doris NGRAM_BF) at the rowset tier
      case "ngram_bf_columns" =>
        td.copy(ngramBloomColumns = v.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      // per-rowset NDV sketches for fold-able approximate distinct counts
      case "ndv_stats_columns" =>
        td.copy(ndvStatsColumns = v.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      // per-rowset value histograms for metadata-served GROUP BY counts
      case "dict_stats_columns" =>
        td.copy(dictStatsColumns = v.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      // Doris's own property name for the Unique merge-on-write mode
      case "enable_unique_key_merge_on_write" =>
        td.copy(mergeOnWrite = v.toBoolean)
      case other => throw new GraftParseException(
        s"unknown table property '$other'")
    }
}
