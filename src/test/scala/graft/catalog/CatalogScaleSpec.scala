package graft.catalog

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{LongType, StringType}
import graft.model.{ColumnSpec, KeysType, TableSchema}

/** Persisted-catalog scale posture, pinned like `ManifestScaleSpec` /
  * `LedgerScaleSpec`: the catalog file is rewritten WHOLE per DDL
  * statement, which is fine exactly because DDL is human-rate and tables
  * are metadata-sized — this spec keeps both assumptions honest (a fat new
  * TableDef field or an accidentally-quadratic persist would trip it
  * first). No Spark involved.
  */
class CatalogScaleSpec extends AnyFunSuite {

  private def td(i: Int) = TableDef(
    db = "db", name = s"t$i",
    schema = TableSchema(KeysType.Unique, Seq(
      ColumnSpec.key("k", LongType),
      ColumnSpec.value("v", LongType),
      ColumnSpec.value("s", StringType).copy(maxLength = 32))),
    policy = PartitionPolicy.Range, partitionColumn = Some("s"),
    partitions = Seq(
      PartitionSpec("p0", Some("2020-01-01"), numBuckets = 4),
      PartitionSpec("p1", Some(RangeBound.MaxValue), numBuckets = 4)),
    bucketColumn = Some("k"), numBuckets = 4,
    retention = Retention.KeepVersions(3),
    renamedColumns = Map("old_v" -> "v"))

  test("1000 tables: bounded file size, fast reload, lossless round trip") {
    val store = Files.createTempDirectory("graft-catscale-").resolve("_catalog.json")
    val c = new CatalogManager(Some(store))
    c.createDatabase("db")
    val n = 1000
    val t0 = System.nanoTime()
    (0 until n).foreach(i => c.createTable(td(i)))
    val createSec = (System.nanoTime() - t0) / 1e9
    // per-DDL cost is O(catalog); 1000 whole-file rewrites of a ~1 MB file
    // must stay interactive (generous bound; typical is a few seconds)
    assert(createSec < 60.0, f"1000 CREATEs took $createSec%.1fs")
    val size = Files.size(store)
    // ~1 KB/table declared posture; trip if an entry bloats past 2 KB
    assert(size < n * 2048L, s"catalog is $size bytes for $n tables")

    val t1 = System.nanoTime()
    val reloaded = new CatalogManager(Some(store))
    val reloadSec = (System.nanoTime() - t1) / 1e9
    assert(reloadSec < 10.0, f"reload took $reloadSec%.1fs")
    assert(reloaded.listTables("db").size === n)
    assert(reloaded.getTable("db", "t123").contains(td(123)),
      "round trip must be lossless")
  }
}
