package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.catalog._
import graft.model._

/** RENAME COLUMN: metadata-only — rowsets written under any former
  * physical name serve under the current declared name, merges work across
  * the rename, routing references follow it, and the refusals are loud.
  */
class RenameColumnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkEngine(): OlapEngine = {
    val eng = new OlapEngine(spark, Files.createTempDirectory("graft-rencol-wh-"))
    eng.createDatabase("rn")
    eng.createTable(TableDef(
      db = "rn", name = "t",
      schema = TableSchema(KeysType.Unique, Seq(
        ColumnSpec.key("k", LongType),
        ColumnSpec.value("v", LongType))),
      bucketColumn = Some("k"), numBuckets = 2))
    eng
  }

  private def kv(cols: (String, String))(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF(cols._1, cols._2)
  }

  test("rename mid-lifecycle: old-name rowsets serve under the new name, " +
    "merge-on-read resolves latest-wins ACROSS the rename, new loads write " +
    "the new name") {
    val eng = mkEngine()
    eng.ingest("rn", "t", kv("k" -> "v")(1L -> 10L, 2L -> 20L))
    eng.renameColumn("rn", "t", "v", "val")
    assert(eng.scan("rn", "t").columns.toSeq === Seq("k", "val"))
    // a post-rename upsert of a pre-rename key: the NEW load must win
    eng.ingest("rn", "t", kv("k" -> "val")(2L -> 99L, 3L -> 30L))
    val got = eng.scan("rn", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set(1L -> 10L, 2L -> 99L, 3L -> 30L))
    // compaction rewrites everything physically under the new name and the
    // answer is unchanged
    eng.compact("rn", "t")
    assert(eng.scan("rn", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === got)
  }

  test("chained renames collapse: files from every era map to the current " +
    "name in one hop") {
    val eng = mkEngine()
    eng.ingest("rn", "t", kv("k" -> "v")(1L -> 1L)) // era v
    eng.renameColumn("rn", "t", "v", "v2")
    eng.ingest("rn", "t", kv("k" -> "v2")(2L -> 2L)) // era v2
    eng.renameColumn("rn", "t", "v2", "v3")
    eng.ingest("rn", "t", kv("k" -> "v3")(3L -> 3L)) // era v3
    val td = eng.catalog.getTable("rn", "t").get
    assert(td.renamedColumns === Map("v" -> "v3", "v2" -> "v3"))
    assert(eng.scan("rn", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("renaming the bucket KEY keeps point lookups routing and pruning") {
    val eng = mkEngine()
    eng.ingest("rn", "t", kv("k" -> "v")((0L until 20L).map(i => i -> i): _*))
    eng.renameColumn("rn", "t", "k", "id")
    val td = eng.catalog.getTable("rn", "t").get
    assert(td.bucketColumn === Some("id"))
    assert(td.schema.keyNames === Seq("id"))
    assert(eng.lookupByKey("rn", "t", "7").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set(7L -> 7L))
    // transparent bucket prune still fires, now keyed on the new name
    val q = eng.scan("rn", "t").filter(col("id") === 7L)
    assert(q.queryExecution.executedPlan.toString.contains("__graft_bucket"))
    assert(q.collect().map(_.getLong(1)).toSeq === Seq(7L))
  }

  test("refusals: existing name, pending dropped name, visible " +
    "delete-predicate reference; and the SQL face works") {
    val eng = mkEngine()
    eng.addColumn("rn", "t", ColumnSpec.value("w", LongType))
    eng.ingest("rn", "t", kv("k" -> "v")(1L -> 1L)
      .withColumn("w", col("v") * 2))
    intercept[IllegalArgumentException] { eng.renameColumn("rn", "t", "v", "w") }
    eng.dropColumn("rn", "t", "w")
    intercept[IllegalArgumentException] { eng.renameColumn("rn", "t", "v", "w") }
    eng.deleteWhere("rn", "t", "k = 99")
    intercept[IllegalArgumentException] { eng.renameColumn("rn", "t", "k", "id") }
    eng.compact("rn", "t") // deletes become physical, predicate retires
    graft.sql.GraftSql.bind(spark, eng)
    try {
      graft.sql.GraftSql.sql(spark,
        "ALTER TABLE rn.t RENAME COLUMN k TO id").collect()
      assert(eng.catalog.getTable("rn", "t").get.schema.keyNames === Seq("id"))
      assert(eng.scan("rn", "t").columns.contains("id"))
    } finally graft.sql.GraftSql.unbind(spark)
  }
}
