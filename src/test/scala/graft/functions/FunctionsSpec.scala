package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.catalog.{BucketType, Fnv}
import graft.functions.FnvHash64.{fnvBucket, fnvHash64}

/** The codegen'd FNV-1a expression must agree byte-for-byte with the
  * driver-side Scala implementation (and so with the reference,
  * src/partition.rs:30-38).
  */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("FnvHash64 expression matches Fnv.hash64 (codegen path)") {
    import spark.implicits._
    val keys = Seq("", "a", "foobar", "1001001", "2002001", "order-123", "é中")
    val got = keys.toDF("k")
      .select(col("k"), fnvHash64(col("k")).as("h"))
      .as[(String, Long)].collect().toMap
    keys.foreach(k => assert(got(k) == Fnv.hash64(k), s"mismatch for '$k'"))
  }

  test("FnvHash64 null propagates") {
    import spark.implicits._
    val r = Seq(Some("a"), None).toDF("k").select(fnvHash64(col("k"))).collect()
    assert(r.count(_.isNullAt(0)) == 1)
  }

  test("fnvBucket matches unsigned-mod routing for all bucket counts") {
    import spark.implicits._
    val keys = (0 until 1000).map(i => s"key-$i")
    for (n <- Seq(1, 3, 4, 7, 16)) {
      val got = keys.toDF("k")
        .select(col("k"), fnvBucket(col("k"), n).as("b"))
        .as[(String, Int)].collect().toMap
      keys.foreach { k =>
        assert(got(k) == BucketType.Hash.bucketForKey(k, n), s"key $k n=$n")
        assert(got(k) >= 0 && got(k) < n)
      }
    }
  }

  test("fnv_hash64 callable from SQL after runtime registration") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT fnv_hash64('foobar') AS h, fnv_hash64(CAST(NULL AS STRING)) AS n")
      .collect().head
    assert(r.getLong(0) == Fnv.hash64("foobar"))
    assert(r.isNullAt(1))
  }

  test("interpreted eval agrees with codegen") {
    // force the interpreted path via a literal fold in the driver
    val e = FnvHash64(org.apache.spark.sql.catalyst.expressions.Literal("foobar"))
    assert(e.eval(null) == Fnv.hash64("foobar"))
  }

  test("VectorDot is bit-identical to the HOF fold it replaced") {
    import spark.implicits._
    // pseudo-random but deterministic vectors, incl. values whose sum order
    // matters at double precision
    val rows = (0 until 50).map { i =>
      val a = (0 until 16).map(j => math.sin(i * 16 + j) * math.pow(10, j % 5)).toArray
      val b = (0 until 16).map(j => math.cos(i * 16 + j) / (j + 1.0)).toArray
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val hof = org.apache.spark.sql.functions.aggregate(
      org.apache.spark.sql.functions.zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val out = df.select(
      VectorDot.vecDot(col("a"), col("b")).as("native"), hof.as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"bit mismatch: $r")
    }
  }

  test("VectorDot null semantics: length mismatch and null element give NULL") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0), Array(3.0)),          // length mismatch
      (Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val r = df.select(VectorDot.vecDot(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0) && r(1).getDouble(0) == 11.0)
    graft.GraftExtensions.register(spark)
    val withNullElem = spark.sql(
      "SELECT vector_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS d")
    assert(withNullElem.collect().head.isNullAt(0))
  }

  test("Md5Prefix60 equals conv(substring(md5,1,15),16,10) incl. multibyte") {
    import spark.implicits._
    val strs = Seq("", "a", "hello world", "0:0", "7:63", "the", "é中文🙂", "x" * 300)
    val df = strs.toDF("s").select(
      Md5Prefix60.md5Prefix60(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("viaHex"))
    df.collect().foreach(r =>
      assert(r.getLong(0) == r.getLong(1) && r.getLong(0) >= 0, s"mismatch: $r"))
  }

  test("Md5Prefix60 null propagates and interpreted agrees with codegen") {
    import spark.implicits._
    val r = Seq(Some("a"), None).toDF("s")
      .select(Md5Prefix60.md5Prefix60(col("s"))).collect()
    assert(r.count(_.isNullAt(0)) == 1)
    val interp = Md5Prefix60(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("a"))).eval(null)
    val viaDf = Seq("a").toDF("s")
      .select(Md5Prefix60.md5Prefix60(col("s"))).collect().head.getLong(0)
    assert(interp == viaDf)
  }

  test("Zorder.interleave places bit i of x at 2i and bit i of y at 2i+1") {
    // hand-computed vectors
    assert(Zorder.interleave(0L, 0L) == 0L)
    assert(Zorder.interleave(1L, 0L) == 1L)
    assert(Zorder.interleave(0L, 1L) == 2L)
    assert(Zorder.interleave(3L, 5L) == 39L)   // spread(3)=5, spread(5)<<1=34
    assert(Zorder.interleave(0xFFFFFFFFL, 0L) == 0x5555555555555555L)
    assert(Zorder.interleave(0L, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
    // bit-by-bit reconstruction over a dense small grid
    for (x <- 0L until 8L; y <- 0L until 8L) {
      val z = Zorder.interleave(x, y)
      val rx = (0 until 3).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val ry = (0 until 3).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(rx == x && ry == y, s"roundtrip failed for ($x,$y) -> $z")
    }
  }

  test("ZorderInterleave: codegen, interpreted, SQL and driver impl agree") {
    import spark.implicits._
    val df = Seq((3L, 5L), (4095L, 0L), (123456L, 654321L)).toDF("x", "y")
    df.select(col("x"), col("y"), Zorder.zorder64(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
      .foreach { case (x, y, z) => assert(z == Zorder.interleave(x, y)) }
    val interp = ZorderInterleave(
      org.apache.spark.sql.catalyst.expressions.Literal(3L),
      org.apache.spark.sql.catalyst.expressions.Literal(5L)).eval(null)
    assert(interp == 39L)
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT zorder64(3L, 5L) AS z, zorder64(CAST(NULL AS BIGINT), 1L) AS n").collect().head
    assert(r.getLong(0) == 39L && r.isNullAt(1))
  }

  test("SortedIntersectCount equals size(array_intersect) on sorted distinct " +
    "arrays (codegen + interpreted), empty/disjoint/null cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"tok$i")
    val rows = (0 until 200).map { i =>
      val a = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size + 1)).sorted
      val b = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size + 1)).sorted
      (i, a, b)
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("merge", graft.functions.SortedIntersectCount
        .sortedIntersectCount(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))))
    assert(df.filter(col("merge") =!= col("ref")).count() == 0)
    // interpreted path agrees with codegen
    val one = rows.head
    val interp = graft.functions.SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(one._2,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(one._3,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))
      .eval(null)
    assert(interp == one._2.toSet.intersect(one._3.toSet).size)
    // null input propagates
    val n = Seq((Option.empty[Seq[String]], Seq("a"))).toDF("a", "b")
      .select(graft.functions.SortedIntersectCount
        .sortedIntersectCount(col("a"), col("b")).as("m")).head()
    assert(n.isNullAt(0))
  }

  test("z-ordered sort gives both-dimension locality (the pruning property)") {
    import spark.implicits._
    // 64x64 grid sorted by z; contiguous chunks of 256 rows must have narrow
    // x AND y extents (16x16 tiles) — exactly what makes per-file min/max
    // stats selective on both columns in a z-clustered layout.
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val sorted = grid.sortBy { case (x, y) => Zorder.interleave(x, y) }
    sorted.grouped(256).foreach { chunk =>
      val xs = chunk.map(_._1); val ys = chunk.map(_._2)
      assert(xs.max - xs.min <= 15 && ys.max - ys.min <= 15,
        s"chunk extent too wide: x=[${xs.min},${xs.max}] y=[${ys.min},${ys.max}]")
    }
  }
}
