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

  test("catalog create/get/drop") {
    val c = new CatalogManager
    c.createDatabase("db")
    c.createTable(rangeTable)
    assert(c.getTable("db", "t").isDefined)
    intercept[IllegalArgumentException](c.createTable(rangeTable)) // duplicate
    assert(c.dropTable("db", "t"))
    assert(c.getTable("db", "t").isEmpty)
  }
}
