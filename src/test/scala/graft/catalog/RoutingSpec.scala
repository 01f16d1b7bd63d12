package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.model._

/** Partition/bucket routing semantics (reference: src/partition.rs,
  * src/table.rs:32-41) incl. the FNV-1a hash and the exclusive-upper-bound
  * string comparison.
  */
class RoutingSpec extends AnyFunSuite {

  test("FNV-1a 64 matches the published test vectors") {
    // public FNV-1a reference vectors (isthe.com/chongo/tech/comp/fnv)
    assert(Fnv.hash64("") == 0xcbf29ce484222325L)
    assert(Fnv.hash64("a") == 0xaf63dc4c8601ec8cL)
    assert(Fnv.hash64("foobar") == 0x85944171f73967e8L)
  }

  test("hash bucketing is unsigned mod, stable, in range") {
    for (key <- Seq("1001001", "1001002", "2002001", "3003003", "", "abc")) {
      val b = BucketType.Hash.bucketForKey(key, 4)
      assert(b >= 0 && b < 4)
      assert(b == BucketType.Hash.bucketForKey(key, 4)) // deterministic
      assert(b == java.lang.Long.remainderUnsigned(Fnv.hash64(key), 4L).toInt)
    }
  }

  private val schema = TableSchema(KeysType.Duplicate, Seq(
    ColumnSpec.key("d", StringType), ColumnSpec.value("v", LongType)))

  private def rangeTable = TableDef(
    db = "db", name = "t", schema = schema,
    policy = PartitionPolicy.Range,
    partitionColumn = Some("d"),
    partitions = Seq(
      PartitionSpec("p10", upperExclusive = Some("2024-07-01"), numBuckets = 4),
      PartitionSpec("p11", upperExclusive = Some("2025-01-01"), numBuckets = 4)),
    bucketColumn = Some("v"), numBuckets = 4)

  test("range routing: first partition with key < upper bound (exclusive)") {
    // mirrors examples/basic_usage.rs:76-133 partitions p10/p11
    assert(rangeTable.route("2024-03-15", "1001001")._1 == "p10")
    assert(rangeTable.route("2024-06-30", "x")._1 == "p10")
    assert(rangeTable.route("2024-07-01", "x")._1 == "p11") // boundary is exclusive
    assert(rangeTable.route("2024-09-20", "2002001")._1 == "p11")
    intercept[NoSuchElementException](rangeTable.route("2025-01-01", "x"))
  }

  test("range max-value sentinel accepts everything") {
    val t = rangeTable.copy(partitions = rangeTable.partitions :+
      PartitionSpec("pmax", upperExclusive = None, numBuckets = 4))
    assert(t.route("2030-12-31", "x")._1 == "pmax")
    assert(t.route("2024-01-01", "x")._1 == "p10")
  }

  test("list routing: exact match only") {
    val t = rangeTable.copy(
      policy = PartitionPolicy.List,
      partitions = Seq(
        PartitionSpec("cn", listValues = Seq("beijing", "shanghai")),
        PartitionSpec("us", listValues = Seq("nyc"))))
    assert(t.route("shanghai", "x")._1 == "cn")
    assert(t.route("nyc", "x")._1 == "us")
    intercept[NoSuchElementException](t.route("paris", "x"))
  }

  test("routing probe fidelity: same (partition,bucket) as direct FNV computation") {
    // the reference's probe rows (examples/basic_usage.rs:142-147)
    for ((d, k) <- Seq(("2024-03-15", "1001001"), ("2024-03-15", "1001002"),
      ("2024-09-20", "2002001"), ("2024-11-11", "3003003"))) {
      val (p, b) = rangeTable.route(d, k)
      assert(p == (if (d < "2024-07-01") "p10" else "p11"))
      assert(b == java.lang.Long.remainderUnsigned(Fnv.hash64(k), 4L).toInt)
    }
  }

  test("catalog create/get/drop; identical re-CREATE is an idempotent " +
    "no-op (DDL replay over a persisted catalog), a DIFFERENT definition " +
    "fails loudly") {
    val c = new CatalogManager
    c.createDatabase("db")
    c.createTable(rangeTable)
    assert(c.getTable("db", "t").isDefined)
    c.createTable(rangeTable) // identical replay: no-op
    assert(c.getTable("db", "t").contains(rangeTable))
    intercept[IllegalArgumentException](
      c.createTable(rangeTable.copy(numBuckets = rangeTable.numBuckets + 1)))
    assert(c.dropTable("db", "t"))
    assert(c.getTable("db", "t").isEmpty)
  }

  test("persisted catalog: a fresh CatalogManager over the same store " +
    "restores every TableDef losslessly (schema, routing, lifecycle state)") {
    val store = java.nio.file.Files.createTempDirectory("graft-cat-")
      .resolve("_catalog.json")
    val c = new CatalogManager(Some(store))
    c.createDatabase("db")
    val evolved = rangeTable.copy(
      retention = Retention.KeepVersions(5),
      varcharMode = VarcharMode.Truncate,
      droppedColumns = Seq("gone"),
      renamedColumns = Map("old_v" -> "v"),
      bucketLayoutFloor = 42L,
      droppedPartitions = Seq(PartitionSpec("pdead", Some("1990-01-01"))))
    c.createTable(evolved)
    val reloaded = new CatalogManager(Some(store))
    assert(reloaded.databaseExists("db"))
    assert(reloaded.getTable("db", "t").contains(evolved),
      s"lossy round trip:\n${reloaded.getTable("db", "t")}\nvs\n$evolved")
    // mutations persist too: drop survives a reload
    assert(reloaded.dropTable("db", "t"))
    assert(new CatalogManager(Some(store)).getTable("db", "t").isEmpty)
  }
}
